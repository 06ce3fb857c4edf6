"""Learning-rate schedules as optax-compatible callables.

Covers the reference's two schedule families:
- step-decay LambdaLR used by the labeler tools (tools/static_train.py:222-227:
  lr * 0.7^(epoch//20), floored by an eta_min rule)
- fastai OneCycle (cosine-annealed lr + momentum, det3d/solver/
  learning_schedules_fastai.py:77-97) used by detector training
- the full torchie LrUpdaterHook policy surface (lr_updater.py:10-175):
  fixed/step/exp/poly/inv/cosine, each composable with ``with_warmup``
  (constant/linear/exp ramps). Only one_cycle and the labeler step decay are
  exercised by shipped configs; the rest are surface parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def labeler_step_decay(
    init_lr: float,
    steps_per_epoch: int,
    step_size: int = 20,
    gamma: float = 0.7,
    eta_min: float = 1e-5,
):
    """Parity: tools/static_train.py:222-227 lr_func (per-epoch LambdaLR).

    factor = gamma^(epoch // step_size) while init_lr * factor > eta_min, else 0.01."""

    def schedule(step):
        epoch = step // steps_per_epoch
        factor = gamma ** (epoch // step_size)
        lr = init_lr * factor
        return jnp.where(lr > eta_min, lr, init_lr * 0.01)

    return schedule


def one_cycle(
    lr_max: float,
    total_steps: int,
    moms: tuple[float, float] = (0.95, 0.85),
    div_factor: float = 10.0,
    pct_start: float = 0.4,
):
    """fastai OneCycle: cosine ramp lr/div->lr then lr->lr/1e4; momentum high->low->high.

    Parity: det3d/solver/learning_schedules_fastai.py:77-97 (config defaults
    configs/.../*_with_vel.py:242-250). Returns (lr_schedule, momentum_schedule)."""
    low_lr = lr_max / div_factor
    a1 = int(total_steps * pct_start)
    a2 = total_steps - a1

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(np.pi * pct) + 1.0)

    def lr_schedule(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / jnp.maximum(a1, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - a1) / jnp.maximum(a2, 1), 0.0, 1.0)
        return jnp.where(
            step <= a1,
            _cos(low_lr, lr_max, pct1),
            _cos(lr_max, lr_max / 1e4, pct2),
        )

    def momentum_schedule(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / jnp.maximum(a1, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - a1) / jnp.maximum(a2, 1), 0.0, 1.0)
        return jnp.where(
            step <= a1,
            _cos(moms[0], moms[1], pct1),
            _cos(moms[1], moms[0], pct2),
        )

    return lr_schedule, momentum_schedule


def fixed_lr(base_lr: float):
    """Parity: torchie FixedLrUpdaterHook (lr_updater.py:85-90)."""

    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)

    return schedule


def step_lr(base_lr: float, step_size, gamma: float = 0.1, steps_per_epoch: int = 1):
    """Parity: torchie StepLrUpdaterHook (lr_updater.py:93-119).

    ``step_size`` is an int (decay every N epochs) or a list of epoch
    milestones; ``steps_per_epoch=1`` reproduces by_epoch=False."""

    def schedule(step):
        progress = step // steps_per_epoch
        if isinstance(step_size, int):
            exp = progress // step_size
        else:
            milestones = jnp.asarray(list(step_size))
            exp = (progress >= milestones).sum()
        return base_lr * gamma ** exp

    return schedule


def exp_lr(base_lr: float, gamma: float, steps_per_epoch: int = 1):
    """Parity: torchie ExpLrUpdaterHook (lr_updater.py:122-129)."""

    def schedule(step):
        return base_lr * gamma ** (step // steps_per_epoch)

    return schedule


def poly_lr(base_lr: float, total_steps: int, power: float = 1.0, min_lr: float = 0.0):
    """Parity: torchie PolyLrUpdaterHook (lr_updater.py:132-146)."""

    def schedule(step):
        coeff = (1.0 - jnp.minimum(step, total_steps) / total_steps) ** power
        return (base_lr - min_lr) * coeff + min_lr

    return schedule


def inv_lr(base_lr: float, gamma: float, power: float = 1.0, steps_per_epoch: int = 1):
    """Parity: torchie InvLrUpdaterHook (lr_updater.py:149-157)."""

    def schedule(step):
        return base_lr * (1.0 + gamma * (step // steps_per_epoch)) ** (-power)

    return schedule


def cosine_lr(base_lr: float, total_steps: int, target_lr: float = 0.0):
    """Parity: torchie CosineLrUpdaterHook (lr_updater.py:160-175)."""

    def schedule(step):
        pct = jnp.minimum(step, total_steps) / total_steps
        return target_lr + 0.5 * (base_lr - target_lr) * (1.0 + jnp.cos(np.pi * pct))

    return schedule


def with_warmup(schedule, warmup_steps: int, warmup_ratio: float = 1.0 / 3.0, mode: str = "linear"):
    """Warmup wrapper matching torchie LrUpdaterHook warmup semantics
    (trainer/hooks/lr_updater.py:36-55): constant/linear/exp ramp to schedule(step)."""

    def warmed(step):
        base = schedule(step)
        if mode == "constant":
            w = warmup_ratio
        elif mode == "linear":
            w = 1.0 - (1.0 - step / jnp.maximum(warmup_steps, 1)) * (1.0 - warmup_ratio)
        elif mode == "exp":
            w = warmup_ratio ** (1.0 - step / jnp.maximum(warmup_steps, 1))
        else:
            raise ValueError(mode)
        return jnp.where(step < warmup_steps, base * w, base)

    return warmed


def adam_with_schedule(
    lr_schedule,
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    momentum_schedule=None,
    b2: float = 0.999,
):
    """Adam (+decoupled weight decay, + optional grad-norm clip, + optional scheduled b1).

    The labeler tools use torch Adam(weight_decay=1e-4) (static_train.py:220) which is
    L2-coupled; adamw with small decay is the standard JAX equivalent. Detector training
    uses OneCycle'd Adam with scheduled momentum (solver/fastai_optim.py)."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if momentum_schedule is not None:
        chain.append(
            optax.inject_hyperparams(
                lambda b1, learning_rate: optax.adamw(
                    learning_rate, b1=b1, b2=b2, weight_decay=weight_decay
                )
            )(b1=momentum_schedule, learning_rate=lr_schedule)
        )
    else:
        chain.append(
            optax.adamw(lr_schedule, b2=b2, weight_decay=weight_decay)
        )
    return optax.chain(*chain)
