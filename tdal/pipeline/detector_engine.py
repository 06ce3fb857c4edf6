"""Detector train/eval/predict engine: jit'd steps for CenterPoint models.

The functional replacement for the reference's Trainer batch processor + CenterHead
loss/predict dispatch (torchie/trainer/trainer.py:353-422, center_head.py:250-495):
one XLA program per step, batch sharded over the data axis under a Mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdal.models.center_head import center_head_loss, predict
from tdal.runtime.train_state import TrainState

TARGET_KEYS = ("hm", "anno_box", "ind", "mask", "cat")


def make_detector_steps(
    detector,
    test_cfg: dict,
    code_weights: Sequence[float],
    weight: float = 2.0,
    donate: bool = True,
):
    has_vel = detector.with_velocity
    num_classes = detector.num_classes

    def train_step(state: TrainState, batch, rng=None):
        targets = {k: batch[k] for k in TARGET_KEYS}

        def loss_of(params):
            preds, mutated = detector.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                mutable=["batch_stats"],
            )
            total, logs = center_head_loss(
                preds, targets, code_weights, weight=weight, has_vel=has_vel
            )
            return total, (logs, mutated["batch_stats"])

        grads, (logs, new_bs) = jax.grad(loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, logs

    def predict_step(state: TrainState, points):
        preds = detector.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
        )
        return predict(preds, test_cfg, num_classes)

    jit_kw = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(train_step, **jit_kw), jax.jit(predict_step)


def make_tta_predict_step(detector, test_cfg: dict):
    """Double-flip TTA inference step: points (B*4, N, D) ordered
    [orig, yflip, xflip, both] per sample; per-task maps are unflipped + averaged
    before decode. Parity: the double_flip branch of CenterHead.predict
    (center_head.py:316-427)."""
    num_classes = detector.num_classes

    def predict_step(state: TrainState, points):
        from tdal.models.tta import average_double_flip_preds

        preds = detector.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
        )
        # the merge averages AFTER sigmoid/exp (reference semantics), so the
        # averaged hm/dim are already activated
        averaged = [average_double_flip_preds(task_preds) for task_preds in preds]
        return predict(averaged, test_cfg, num_classes, activated=True)

    return jax.jit(predict_step)


def predictions_to_host(batch_preds, tokens):
    """Fixed-shape device predictions -> per-frame variable-length numpy dicts keyed
    like the reference's detection output (dist_test.py:169-180): token ->
    {'box3d_lidar' (K, 7|9), 'scores' (K,), 'label_preds' (K,)}.

    One jax.device_get of the whole tree: through the axon tunnel a single
    batched fetch measures ~26 ms where four sequential np.asarray() fetches
    of the same arrays measure 100+ ms (each pays full round-trip latency)."""
    import jax

    host = jax.device_get(batch_preds)
    boxes = host["box3d_lidar"]
    scores = host["scores"]
    labels = host["label_preds"]
    valid = host["valid"]
    out = {}
    for i, token in enumerate(tokens):
        m = valid[i]
        out[token] = {
            "box3d_lidar": boxes[i][m],
            "scores": scores[i][m],
            "label_preds": labels[i][m],
        }
    return out
