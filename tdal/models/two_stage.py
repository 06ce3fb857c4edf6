"""Two-stage CenterPoint: BEV feature gather + RoIHead refinement, TPU-native.

Capability parity with reference:
- ``get_box_centers``            ~ TwoStageDetector.get_box_center (two_stage.py:49-76):
  5-point box sampling (center + 4 side midpoints).
- ``bilinear_interpolate``       ~ center_utils.bilinear_interpolate_torch (:92-121).
- ``BEVFeatureExtractor``        ~ second_stage/bird_eye_view.py:10-41.
- ``RoIHead``                    ~ roi_heads/roi_head.py:17-106 (shared 1x1-conv FC
  stack + IoU-score cls + box reg heads).
- ``proposal_targets``           ~ target_assigner/proposal_target_layer.py:19-243:
  per-image subsampling of ROI_PER_IMAGE rois (FG_RATIO fg, hard/easy bg mix),
  per-class IoU matching, roi_iou soft labels. Reference nonzero()+randperm python
  becomes masked argsort + modular wraparound — fixed shapes, one XLA program.
- ``assign_roi_targets``         ~ roi_head_template.assign_targets (:43-86):
  per-roi canonicalization and heading flip.
- ``roi_losses``                 ~ roi_head_template.get_loss (:88-151): BCE on IoU
  soft labels + weighted L1 on canonical residuals.
- ``generate_predicted_boxes`` / ``two_stage_post_process``
                                 ~ roi_head_template.py:153-182 + two_stage.py:121-151
  (sqrt(iou*score) rescoring).

The reference's fixed NMS_POST_MAXSIZE padding/reorder loop (two_stage.py:78-119) is
unnecessary here: tdal's first-stage predict already returns fixed-shape (B, K) rois.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# BEV feature extraction
# ---------------------------------------------------------------------------


def bilinear_interpolate(im, x, y):
    """im (H, W, C); x, y (N,) continuous grid coords -> (N, C).

    Weights use the UNCLAMPED neighbor positions so samples exactly on the far
    border still interpolate correctly (the reference clamps before weighting,
    center_utils.py:92-121, which zeroes border samples — a quirk, not a feature)."""
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    x0 = jnp.clip(xf.astype(jnp.int32), 0, im.shape[1] - 1)
    x1 = jnp.clip(x0 + 1, 0, im.shape[1] - 1)
    y0 = jnp.clip(yf.astype(jnp.int32), 0, im.shape[0] - 1)
    y1 = jnp.clip(y0 + 1, 0, im.shape[0] - 1)
    Ia, Ib = im[y0, x0], im[y1, x0]
    Ic, Id = im[y0, x1], im[y1, x1]
    wa = (xf + 1 - x) * (yf + 1 - y)
    wb = (xf + 1 - x) * (y - yf)
    wc = (x - xf) * (yf + 1 - y)
    wd = (x - xf) * (y - yf)
    return (
        Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None] + Id * wd[:, None]
    )


def get_box_centers(boxes, num_point: int = 5):
    """boxes (B, K, >=7, heading last) -> (B, K, num_point, 3) sample points."""
    center = boxes[..., :3]
    if num_point == 1:
        return center[..., None, :]
    assert num_point == 5
    h = boxes[..., -1]
    c, s = jnp.cos(h), jnp.sin(h)
    dx = boxes[..., 3] / 2.0  # first dim along local x
    dy = boxes[..., 4] / 2.0
    # side midpoints in local frame: (+-dx, 0), (0, +-dy)
    def world(lx, ly):
        wx = center[..., 0] + c * lx - s * ly
        wy = center[..., 1] + s * lx + c * ly
        return jnp.stack([wx, wy, center[..., 2]], axis=-1)

    pts = jnp.stack(
        [
            center,
            world(-dx, jnp.zeros_like(dx)),  # front/back/left/right midpoints
            world(dx, jnp.zeros_like(dx)),
            world(jnp.zeros_like(dy), -dy),
            world(jnp.zeros_like(dy), dy),
        ],
        axis=-2,
    )
    return pts


@dataclasses.dataclass(frozen=True)
class BEVFeatureExtractor:
    """Bilinear gather of BEV features at box sample points."""

    pc_start: tuple
    voxel_size: tuple
    out_stride: int

    def __call__(self, bev_feature, centers):
        """bev_feature (B, H, W, C); centers (B, K, P, 3) -> (B, K, P*C)."""
        b, k, p, _ = centers.shape
        xs = (centers[..., 0] - self.pc_start[0]) / self.voxel_size[0] / self.out_stride
        ys = (centers[..., 1] - self.pc_start[1]) / self.voxel_size[1] / self.out_stride

        def one(im, x, y):
            return bilinear_interpolate(im, x.reshape(-1), y.reshape(-1))

        feats = jax.vmap(one)(bev_feature, xs, ys)  # (B, K*P, C)
        return feats.reshape(b, k, p * bev_feature.shape[-1])


# ---------------------------------------------------------------------------
# RoIHead
# ---------------------------------------------------------------------------


class RoIHead(nn.Module):
    """(B, K, Cin) roi features -> (rcnn_cls (B, K, 1), rcnn_reg (B, K, code_size))."""

    shared_fc: Sequence[int] = (256, 256)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    code_size: int = 7
    num_class: int = 1
    dp_ratio: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_features, train: bool = False):
        x = roi_features
        for i, f in enumerate(self.shared_fc):
            x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)

        def branch(h, fcs, out):
            for i, f in enumerate(fcs):
                h = nn.Dense(f, use_bias=False, dtype=self.dtype)(h)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                )(h)
                h = nn.relu(h)
                if i == 0 and self.dp_ratio >= 0:
                    h = nn.Dropout(self.dp_ratio, deterministic=not train)(h)
            return nn.Dense(
                out, use_bias=True, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.001),
            )(h)

        rcnn_cls = branch(x, self.cls_fc, self.num_class)
        rcnn_reg = branch(x, self.reg_fc, self.code_size)
        return rcnn_cls, rcnn_reg


# ---------------------------------------------------------------------------
# Proposal target assignment (train only)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RoiTargetConfig:
    roi_per_image: int = 128
    fg_ratio: float = 0.5
    sample_roi_by_each_class: bool = True
    cls_score_type: str = "roi_iou"
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    hard_bg_ratio: float = 0.8
    reg_fg_thresh: float = 0.55


def _subsample(rng, iou_max, cfg: RoiTargetConfig):
    """Fixed-shape fg/hard-bg/easy-bg subsampling. Returns (M,) indices into rois."""
    k = iou_max.shape[0]
    m = cfg.roi_per_image
    fg_target = int(round(cfg.fg_ratio * m))
    fg_thresh = min(cfg.reg_fg_thresh, cfg.cls_fg_thresh)

    fg = iou_max >= fg_thresh
    easy = iou_max < cfg.cls_bg_thresh_lo
    hard = (~fg) & (~easy)

    r1, r2, r3 = jax.random.split(rng, 3)

    def order(mask, r):
        key = mask.astype(jnp.float32) * 2.0 + jax.random.uniform(r, (k,))
        return jnp.argsort(-key)

    fg_order = order(fg, r1)
    hard_order = order(hard, r2)
    easy_order = order(easy, r3)
    n_fg, n_hard, n_easy = fg.sum(), hard.sum(), easy.sum()

    n_fg_take = jnp.minimum(fg_target, n_fg)
    n_bg = m - n_fg_take
    # bg mix (proposal_target_layer.py:181-210): hard_bg_ratio of bg from hard pool
    n_hard_take = jnp.where(
        n_easy > 0,
        jnp.minimum((n_bg * cfg.hard_bg_ratio).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, n_bg, 0),
    )
    n_hard_take = jnp.where(n_hard > 0, n_hard_take, 0)
    n_easy_take = n_bg - n_hard_take

    slots = jnp.arange(m)
    fg_idx = fg_order[slots % jnp.maximum(n_fg, 1)]
    hard_idx = hard_order[(slots - n_fg_take) % jnp.maximum(n_hard, 1)]
    easy_idx = easy_order[(slots - n_fg_take - n_hard_take) % jnp.maximum(n_easy, 1)]

    idx = jnp.where(
        slots < n_fg_take,
        fg_idx,
        jnp.where(slots < n_fg_take + n_hard_take, hard_idx, easy_idx),
    )
    # No-bg edge case (fg fills everything with replacement,
    # proposal_target_layer.py:160-166).
    idx = jnp.where((n_hard + n_easy) == 0, fg_order[slots % jnp.maximum(n_fg, 1)], idx)
    return idx


def proposal_targets(rng, rois, roi_scores, roi_labels, roi_features, gt_boxes_and_cls, cfg: RoiTargetConfig):
    """Batched ROI sampling + target assignment.

    rois (B, K, C>=7 heading at 6), roi_labels (B, K) 1-based (0 = padding),
    gt_boxes_and_cls (B, G, code+1) with class last (0 rows = padding).
    Returns dict of (B, M, ...) buffers."""
    from tdal.core.iou import boxes_iou_3d

    code_size = rois.shape[-1]

    def per_sample(r, roi, score, label, feat, gt):
        gt_boxes = gt[:, :7]
        gt_labels = gt[:, -1]
        iou = boxes_iou_3d(roi[:, :7], gt_boxes)  # (K, G)
        if cfg.sample_roi_by_each_class:
            same = label[:, None] == gt_labels[None, :]
            iou = jnp.where(same, iou, 0.0)
        # mask padding gts (all-zero rows)
        valid_gt = (jnp.abs(gt).sum(axis=1) > 0)[None, :]
        iou = jnp.where(valid_gt, iou, 0.0)
        iou_max = iou.max(axis=1)
        gt_assign = iou.argmax(axis=1)
        sel = _subsample(r, iou_max, cfg)
        return (
            roi[sel],
            gt[gt_assign[sel]],
            iou_max[sel],
            score[sel],
            label[sel],
            feat[sel],
        )

    rngs = jax.random.split(rng, rois.shape[0])
    b_rois, b_gt, b_iou, b_scores, b_labels, b_feats = jax.vmap(per_sample)(
        rngs, rois, roi_scores, roi_labels, roi_features, gt_boxes_and_cls
    )

    reg_valid_mask = (b_iou > cfg.reg_fg_thresh).astype(jnp.int32)
    if cfg.cls_score_type == "roi_iou":
        fg = b_iou > cfg.cls_fg_thresh
        bg = b_iou < cfg.cls_bg_thresh
        interval = (~fg) & (~bg)
        soft = (b_iou - cfg.cls_bg_thresh) / (cfg.cls_fg_thresh - cfg.cls_bg_thresh)
        cls_labels = jnp.where(fg, 1.0, jnp.where(interval, soft, 0.0))
    else:
        cls_labels = (b_iou > cfg.cls_fg_thresh).astype(jnp.float32)

    targets = {
        "rois": b_rois,
        "gt_of_rois_src": b_gt,
        "gt_iou_of_rois": b_iou,
        "roi_scores": b_scores,
        "roi_labels": b_labels,
        "roi_features": b_feats,
        "reg_valid_mask": reg_valid_mask,
        "rcnn_cls_labels": cls_labels,
    }
    targets["gt_of_rois"] = assign_roi_targets(b_rois, b_gt)
    return targets


def assign_roi_targets(rois, gt_of_rois):
    """Canonicalize GT boxes into each ROI's frame + heading flip.

    Parity: roi_head_template.assign_targets (:43-86). rois (B, M, C),
    gt_of_rois (B, M, C+1) -> (B, M, C+1)."""
    roi_ry = rois[..., 6] - jnp.floor(rois[..., 6] / (2 * np.pi) + 0.5) * (2 * np.pi)
    gt = gt_of_rois
    delta = gt[..., :6] - rois[..., :6]
    heading = gt[..., 6] - roi_ry
    # rotate xy into roi frame
    c, s = jnp.cos(-roi_ry), jnp.sin(-roi_ry)
    x = c * delta[..., 0] - s * delta[..., 1]
    y = s * delta[..., 0] + c * delta[..., 1]
    rest = gt[..., 7:]
    if rois.shape[-1] == 9:
        rest = jnp.concatenate(
            [gt[..., 7:-1] - rois[..., 7:9], gt[..., -1:]], axis=-1
        )
    # heading flip into (-pi/2, pi/2) (roi_head_template.py:73-81)
    h = heading % (2 * np.pi)
    opp = (h > np.pi * 0.5) & (h < np.pi * 1.5)
    h = jnp.where(opp, (h + np.pi) % (2 * np.pi), h)
    h = jnp.where(h > np.pi, h - 2 * np.pi, h)
    h = jnp.clip(h, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [
            jnp.stack([x, y], axis=-1),
            delta[..., 2:6],
            h[..., None],
            rest,
        ],
        axis=-1,
    )


def roi_losses(rcnn_cls, rcnn_reg, targets, code_weights, cls_weight=1.0, reg_weight=1.0):
    """BCE(iou soft labels) + masked weighted L1 on canonical residuals.

    Parity: roi_head_template.get_loss (:88-151)."""
    cls_flat = rcnn_cls.reshape(-1)
    labels = targets["rcnn_cls_labels"].reshape(-1)
    p = jnp.clip(jax.nn.sigmoid(cls_flat), 1e-7, 1 - 1e-7)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    valid = (labels >= 0).astype(jnp.float32)
    rcnn_loss_cls = (bce * valid).sum() / jnp.maximum(valid.sum(), 1.0) * cls_weight

    code_size = rcnn_reg.shape[-1]
    reg_targets = targets["gt_of_rois"][..., :code_size].reshape(-1, code_size)
    fg = (targets["reg_valid_mask"].reshape(-1) > 0).astype(jnp.float32)
    l1 = jnp.abs(rcnn_reg.reshape(-1, code_size) - reg_targets)
    l1 = l1 * jnp.asarray(code_weights, l1.dtype)
    rcnn_loss_reg = (
        (l1 * fg[:, None]).sum() / jnp.maximum(fg.sum(), 1.0) * reg_weight
    )
    return rcnn_loss_cls, rcnn_loss_reg


def generate_predicted_boxes(rois, rcnn_reg):
    """Decode canonical residuals back to world boxes.

    Parity: roi_head_template.generate_predicted_boxes (:153-182)."""
    code_size = rcnn_reg.shape[-1]
    local = rcnn_reg + jnp.concatenate(
        [jnp.zeros_like(rois[..., :3]), rois[..., 3:code_size]], axis=-1
    )
    ry = rois[..., 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    x = c * local[..., 0] - s * local[..., 1]
    y = s * local[..., 0] + c * local[..., 1]
    out = jnp.concatenate(
        [
            jnp.stack([x + rois[..., 0], y + rois[..., 1]], axis=-1),
            (local[..., 2] + rois[..., 2])[..., None],
            local[..., 3:],
        ],
        axis=-1,
    )
    return out


def two_stage_post_process(batch_box_preds, rcnn_cls, roi_scores, roi_labels, valid):
    """sqrt(sigmoid(iou) * first-stage score) rescoring; labels back to 0-based.

    Parity: two_stage.py:121-151. Returns fixed-shape dict with 'valid'."""
    scores = jnp.sqrt(
        jax.nn.sigmoid(rcnn_cls[..., 0]) * jnp.maximum(roi_scores, 0.0)
    )
    boxes = batch_box_preds
    if boxes.shape[-1] == 9:
        boxes = boxes[..., [0, 1, 2, 3, 4, 5, 7, 8, 6]]
    ok = valid & (roi_labels != 0)
    return {
        "box3d_lidar": boxes,
        "scores": jnp.where(ok, scores, -jnp.inf),
        "label_preds": jnp.maximum(roi_labels - 1, 0),
        "valid": ok,
    }
