"""Shared train/eval engine for the static & dynamic auto-labelers.

The functional, pjit'd replacement for the reference's per-tool training loops
(tools/static_train.py:53-166, tools/dynamic_train.py:37-133): one jit'd train step
(forward + loss + grads + optimizer + batched metrics, a single XLA program) and one
jit'd eval step. Under a ``Mesh`` the batch is sharded over the ``data`` axis; GSPMD
makes BatchNorm statistics and gradient reductions global automatically (the TPU-native
equivalent of apex syncBN + DDP allreduce).

The per-batch IoU metrics run on-device via ``tdal.core.iou.compute_box3d_iou``
(vectorized corner IoU) instead of the reference's per-box Shapely CPU loop in the hot
loop (tools/utils.py:81-103 — SURVEY.md §3.4 flags it as a hot-loop stall).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tdal.core.iou import compute_box3d_iou
from tdal.runtime.train_state import TrainState

LABEL_KEYS = (
    "mask_label",
    "center_label",
    "heading_class_label",
    "heading_residuals_label",
    "size_class_label",
    "size_residuals_label",
)


def batch_labels(batch):
    return {k: batch[k] for k in LABEL_KEYS}


def labeler_metrics(output, labels):
    """seg acc + IoU2D/3D + acc@{0.7,0.5} per batch, all on-device.

    Parity: the per-iteration metric block of tools/static_train.py:93-131.
    For the two-box model the heading labels come from the model output
    (relative to box one), exactly as the reference does (static_train.py:107-120)."""
    h_cls_label = output.get("heading_class_label_two", labels["heading_class_label"])
    h_res_label = output.get(
        "heading_residuals_label_two", labels["heading_residuals_label"]
    )
    iou2d, iou3d = compute_box3d_iou(
        output["center"],
        output["heading_scores"],
        output["heading_residuals"],
        output["size_scores"],
        output["size_residuals"],
        labels["center_label"],
        h_cls_label,
        h_res_label,
        labels["size_class_label"],
        labels["size_residuals_label"],
    )
    seg_correct = (
        jnp.argmax(output["logits"], axis=2) == labels["mask_label"].astype(jnp.int32)
    ).mean()
    return {
        "seg_acc": seg_correct,
        "iou2d": iou2d.mean(),
        "iou3d": iou3d.mean(),
        "iou3d_acc_07": (iou3d >= 0.7).mean(),
        "iou3d_acc_05": (iou3d >= 0.5).mean(),
    }


def make_steps(model, loss_fn: Callable, inputs_fn: Callable, donate: bool = True):
    """Build (train_step, eval_step) for a labeler.

    inputs_fn(batch) -> tuple of model positional inputs (e.g. (pts, init_box, bbox_gt)).
    loss_fn(output, labels) -> dict with 'total_loss'.
    """

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "gather": jax.random.fold_in(step_rng, 0),
            "dropout": jax.random.fold_in(step_rng, 1),
        }
        labels = batch_labels(batch)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs_fn(batch),
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            losses = loss_fn(out, labels)
            return losses["total_loss"], (losses, out, mutated["batch_stats"])

        grads, (losses, out, new_bs) = jax.grad(loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {**losses, **labeler_metrics(out, labels)}
        return new_state, metrics

    def eval_step(state: TrainState, batch):
        labels = batch_labels(batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs_fn(batch),
            train=False,
        )
        losses = loss_fn(out, labels)
        metrics = {**losses, **labeler_metrics(out, labels)}
        return metrics, out

    jit_kw = dict(donate_argnums=(0,)) if donate else {}
    return (
        jax.jit(train_step, **jit_kw),
        jax.jit(eval_step),
    )


def make_predict_step(model, inputs_fn: Callable):
    """jit'd inference step returning the decoded (B, 7) boxes in the init-box frame
    of reference eval postprocessing (static_eval.py:276-287: argmax decode; the caller
    adds base center/heading per stage semantics)."""

    @jax.jit
    def predict(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs_fn(batch),
            train=False,
        )
        return out

    return predict


def average_metrics(metric_list):
    """Host-side mean of a list of on-device metric dicts."""
    if not metric_list:
        return {}
    keys = metric_list[0].keys()
    return {
        k: float(jnp.mean(jnp.stack([jnp.asarray(m[k]) for m in metric_list])))
        for k in keys
    }
