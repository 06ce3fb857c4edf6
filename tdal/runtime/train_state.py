"""Train state: params + batch_stats + optimizer, a JAX pytree.

The functional replacement for the reference's Trainer-held mutable nn.Module +
torch.optim state (det3d/torchie/trainer/trainer.py:130-595). Because the whole state
is a pytree, pjit shards it and checkpointing is structural.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        return cls(
            step=0,
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
        )


def init_model(model, rngs, *example_inputs, **kwargs):
    """Initialize a flax module, returning (params, batch_stats).

    The init is jitted: eager init executes every op as its own XLA program, which
    at production shapes costs minutes of per-op compiles (335s vs 48s measured for
    the sparse VoxelNet backbone)."""
    variables = jax.jit(model.init, static_argnames=tuple(kwargs))(
        rngs, *example_inputs, **kwargs
    )
    return variables["params"], variables.get("batch_stats", {})


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
