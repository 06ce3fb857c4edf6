"""Two-stage detector engine: wires first stage + BEV gather + RoIHead into jit'd
train/predict steps.

Capability parity with reference TwoStageDetector.forward (two_stage.py:154-193):
first stage forward_two_stage -> box centers -> BEV bilinear gather -> (fixed-shape)
ROI reorder -> proposal targets -> RoIHead -> combined loss / sqrt-rescored output.
Frozen-first-stage finetuning (single_stage.py:33-62 freeze + FrozenBatchNorm) maps to
stop_gradient on first-stage outputs + running BN stats + an optax mask that excludes
first-stage params from updates (see make_frozen_tx).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from tdal.models.center_head import center_head_loss, predict
from tdal.models.two_stage import (
    BEVFeatureExtractor,
    RoiTargetConfig,
    generate_predicted_boxes,
    get_box_centers,
    proposal_targets,
    roi_losses,
    two_stage_post_process,
)
from tdal.pipeline.detector_engine import TARGET_KEYS
from tdal.runtime.train_state import TrainState


def make_frozen_tx(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Apply updates only to the 'roi' subtree (frozen first stage)."""
    def label_fn(params):
        return {k: ("roi" if k == "roi" else "first") for k in params}

    return optax.multi_transform(
        {"roi": tx, "first": optax.set_to_zero()}, label_fn
    )


class TwoStageEngine:
    """first_stage: a tdal detector module (PointPillars/VoxelNet);
    roi_head: tdal.models.two_stage.RoIHead."""

    def __init__(
        self,
        first_stage,
        roi_head,
        test_cfg: dict,
        bev_extractor: BEVFeatureExtractor,
        roi_cfg: RoiTargetConfig = RoiTargetConfig(),
        num_point: int = 5,
        code_weights_first: Sequence[float] = (1.0,) * 8,
        code_weights_roi: Sequence[float] = (1.0,) * 7,
        first_weight: float = 2.0,
        freeze_first: bool = True,
    ):
        self.first = first_stage
        self.roi_head = roi_head
        self.test_cfg = test_cfg
        self.bev_extractor = bev_extractor
        self.roi_cfg = roi_cfg
        self.num_point = num_point
        self.code_weights_first = tuple(code_weights_first)
        self.code_weights_roi = tuple(code_weights_roi)
        self.first_weight = first_weight
        self.freeze_first = freeze_first
        self.code_size = roi_head.code_size

    # -- shared first-stage pass -> fixed-shape rois + gathered features ----
    def _first_stage_rois(self, variables_first, points, train: bool):
        mutable = ["batch_stats"] if (train and not self.freeze_first) else False
        out = self.first.apply(
            variables_first,
            points,
            train=train and not self.freeze_first,
            return_feature=True,
            mutable=mutable,
        )
        (preds_dicts, bev), new_bs = out if mutable else (out, None)
        boxes = predict(preds_dicts, self.test_cfg, self.first.num_classes)
        if self.freeze_first:
            boxes = jax.lax.stop_gradient(boxes)
            bev = jax.lax.stop_gradient(bev)

        raw = boxes["box3d_lidar"]  # (B, K, 7|9), heading last
        valid = boxes["valid"]
        centers = get_box_centers(raw, self.num_point)
        feats = self.bev_extractor(bev, centers)  # (B, K, P*C)

        rois = raw
        if raw.shape[-1] == 9:  # move heading to slot 6 (two_stage.py:100-105)
            rois = raw[..., [0, 1, 2, 3, 4, 5, 8, 6, 7]]
        rois = rois * valid[..., None]
        roi_labels = jnp.where(valid, boxes["label_preds"] + 1, 0)
        roi_scores = jnp.where(valid, boxes["scores"], 0.0)
        feats = feats * valid[..., None]
        return preds_dicts, new_bs, rois, roi_labels, roi_scores, feats, valid

    def make_steps(self, donate: bool = True):
        def train_step(state: TrainState, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_of(params):
                vf = {"params": params["first"], "batch_stats": state.batch_stats["first"]}
                preds_dicts, new_bs_first, rois, roi_labels, roi_scores, feats, valid = (
                    self._first_stage_rois(vf, batch["points"], train=True)
                )
                targets = proposal_targets(
                    jax.random.fold_in(step_rng, 0),
                    rois,
                    roi_scores,
                    roi_labels,
                    feats,
                    batch["gt_boxes_and_cls"][..., : self.code_size + 1]
                    if self.code_size == 7
                    else batch["gt_boxes_and_cls"],
                    self.roi_cfg,
                )
                (rcnn_cls, rcnn_reg), roi_mut = self.roi_head.apply(
                    {"params": params["roi"], "batch_stats": state.batch_stats["roi"]},
                    targets["roi_features"],
                    train=True,
                    rngs={"dropout": jax.random.fold_in(step_rng, 1)},
                    mutable=["batch_stats"],
                )
                cls_loss, reg_loss = roi_losses(
                    rcnn_cls, rcnn_reg, targets, self.code_weights_roi
                )
                total = cls_loss + reg_loss
                logs = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}
                if not self.freeze_first:
                    first_targets = {k: batch[k] for k in TARGET_KEYS}
                    one_total, one_logs = center_head_loss(
                        preds_dicts,
                        first_targets,
                        self.code_weights_first,
                        weight=self.first_weight,
                        has_vel=self.first.with_velocity,
                    )
                    total = total + one_total
                    logs.update(one_logs)
                logs["loss"] = total
                new_bs = {
                    "first": (
                        new_bs_first["batch_stats"]
                        if new_bs_first
                        else state.batch_stats["first"]
                    ),
                    "roi": roi_mut["batch_stats"],
                }
                return total, (logs, new_bs)

            grads, (logs, new_bs) = jax.grad(loss_of, has_aux=True)(state.params)
            return state.apply_gradients(grads, new_bs), logs

        def predict_step(state: TrainState, points):
            vf = {
                "params": state.params["first"],
                "batch_stats": state.batch_stats["first"],
            }
            _, _, rois, roi_labels, roi_scores, feats, valid = self._first_stage_rois(
                vf, points, train=False
            )
            rcnn_cls, rcnn_reg = self.roi_head.apply(
                {
                    "params": state.params["roi"],
                    "batch_stats": state.batch_stats["roi"],
                },
                feats,
                train=False,
            )
            batch_box_preds = generate_predicted_boxes(rois, rcnn_reg)
            return two_stage_post_process(
                batch_box_preds, rcnn_cls, roi_scores, roi_labels, valid
            )

        jit_kw = dict(donate_argnums=(0,)) if donate else {}
        return jax.jit(train_step, **jit_kw), jax.jit(predict_step)

    def init(self, rng, points, gt_boxes_and_cls):
        """Initialize both stages; returns (params, batch_stats) nested dicts.

        Jitted as ONE program: eager flax init at the production grid runs the
        whole first stage op-by-op through per-op compiles (~750 s on the axon
        remote compile helper vs ~110 s for the single jitted+cached program)."""

        def _init(rng, points):
            vf = self.first.init({"params": rng}, points)
            first_params = vf["params"]
            first_bs = vf.get("batch_stats", {})
            _, _, rois, roi_labels, roi_scores, feats, valid = self._first_stage_rois(
                {"params": first_params, "batch_stats": first_bs}, points, train=False
            )
            vr = self.roi_head.init({"params": rng, "dropout": rng}, feats)
            return (
                {"first": first_params, "roi": vr["params"]},
                {"first": first_bs, "roi": vr.get("batch_stats", {})},
            )

        return jax.jit(_init)(rng, points)
