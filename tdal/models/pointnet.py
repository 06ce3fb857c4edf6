"""PointNet building blocks for the Frustum-PointNet auto-labelers, TPU-first.

Covers the shared machinery of reference ``tools/static_model.py`` and
``tools/dynamic_model.py``: shared-MLP (1x1 conv) + BN + ReLU stacks, per-set max-pool,
the mask-based object-point gather, and the 59-way box-head output parsing.

TPU-native design notes
-----------------------
- Layout is channels-last ``(B, N, C)``: every "Conv1d(k=1)" is a Dense over the last
  axis, which XLA lowers to one large ``(B*N, Cin) @ (Cin, Cout)`` MXU matmul and fuses
  the BN+ReLU epilogue into it. (The reference uses (B, C, N) torch Conv1d;
  static_model.py:241-339.)
- ``gather_object_points`` replaces the reference's per-sample Python loop over
  ``torch.nonzero`` + ``np.random.choice`` (static_model.py:23-49) with a vectorized
  argsort over (mask, noise) keys + modular duplication — one XLA program, no host sync.
  Because every consumer is a permutation-invariant max-pool PointNet, the random
  shuffle/duplication in the reference has no effect on its forward output; only the
  *subset* choice matters when more than ``n_pts`` points are positive, which the noise
  key reproduces (uniformly random subset without replacement).
- BatchNorm uses ``axis_name`` for cross-device stat sync under pjit/shard_map — the
  TPU-native replacement for apex syncBN (reference apis/train.py:269).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.codecs import MEAN_SIZE_ARR, NUM_HEADING_BIN, NUM_SIZE_CLUSTER

BOX_PRED_DIM = 3 + NUM_HEADING_BIN * 2 + NUM_SIZE_CLUSTER * 4  # 59


class SharedMLP(nn.Module):
    """Dense + BatchNorm + ReLU over the channel (last) axis, per layer.

    Equivalent of the reference's Conv1d(k=1)+BatchNorm1d+ReLU stacks."""

    features: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class DenseBNStack(nn.Module):
    """FC + BatchNorm + ReLU stack over (B, C) features."""

    features: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class PointNetSeg(nn.Module):
    """3D instance segmentation PointNet.

    Parity: reference PointNetInstanceSeg (static_model.py:241-296,
    dynamic_model.py:157-212): 5-layer encoder (64,64,64,128,1024) -> global max-pool,
    concat skip from layer 2 (64+1024=1088) -> 4-layer decoder (512,256,128,128) ->
    dropout(0.5) -> 2-way logits per point.

    Input (B, N, C); output logits (B, N, 2)."""

    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        enc1 = SharedMLP([64, 64], axis_name=self.axis_name, dtype=self.dtype)(
            pts, train
        )
        enc2 = SharedMLP(
            [64, 128, 1024], axis_name=self.axis_name, dtype=self.dtype
        )(enc1, train)
        global_feat = jnp.max(enc2, axis=1, keepdims=True)  # (B, 1, 1024)
        n = pts.shape[1]
        concat = jnp.concatenate(
            [enc1, jnp.broadcast_to(global_feat, (pts.shape[0], n, 1024))], axis=-1
        )  # (B, N, 1088)
        x = SharedMLP(
            [512, 256, 128, 128], axis_name=self.axis_name, dtype=self.dtype
        )(concat, train)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        logits = nn.Dense(2, dtype=self.dtype)(x)
        return logits


class PointNetBoxEst(nn.Module):
    """Amodal box-estimation PointNet.

    Parity: reference PointNetEstimation (static_model.py:298-339): shared MLP
    (128,128,256,512) -> max-pool -> FC(512)+BN+ReLU -> FC(256)+BN+ReLU -> FC(59).

    Input (B, M, C); output (B, 59)."""

    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        x = SharedMLP(
            [128, 128, 256, 512], axis_name=self.axis_name, dtype=self.dtype
        )(pts, train)
        x = jnp.max(x, axis=1)  # (B, 512)
        x = DenseBNStack([512, 256], axis_name=self.axis_name, dtype=self.dtype)(
            x, train
        )
        return nn.Dense(BOX_PRED_DIM, dtype=self.dtype)(x)


def gather_object_points(pts, logits, n_pts: int, rng=None):
    """Gather up to ``n_pts`` predicted-object points per set, fully vectorized.

    pts: (B, N, C); logits: (B, N, 2). Returns (object_pts (B, n_pts, C), mask (B, N)).

    Semantics of reference point_cloud_masking + gather_object_pts
    (static_model.py:23-62): points with logits[...,1] > logits[...,0] are "object";
    a random subset of exactly n_pts is gathered (duplicating when fewer, subsampling
    when more); all-zero rows when a set has no positive points.

    Here: sort keys are (is_object, noise) so positives land first in random order,
    then slot k >= n_pos wraps around modulo n_pos (duplication). Downstream max-pool
    PointNets are permutation/duplication invariant, so this matches the reference's
    forward semantics exactly while staying one XLA program.
    """
    b, n, _ = pts.shape
    mask = logits[..., 1] > logits[..., 0]  # (B, N)
    if rng is not None:
        noise = jax.random.uniform(rng, (b, n))
    else:
        noise = jnp.zeros((b, n))
    # Descending sort by mask first, then noise.
    key = mask.astype(jnp.float32) * 2.0 + noise
    order = jnp.argsort(-key, axis=1)  # (B, N): positives first
    n_pos = mask.sum(axis=1)  # (B,)
    slot = jnp.arange(n_pts)[None, :]  # (1, n_pts)
    denom = jnp.maximum(n_pos, 1)[:, None]
    take = jnp.where(slot < denom, slot, slot % denom)  # wraparound duplication
    # per-batch ROW gathers (take_along_axis lowers to a sliced gather that
    # serializes on TPU; see center_head._gather_feat)
    idx = jax.vmap(lambda o, t: o[t])(order, take)  # (B, n_pts)
    gathered = jax.vmap(lambda p, i: p[i])(pts, idx)  # (B, n_pts, C)
    gathered = gathered * (n_pos > 0)[:, None, None]  # zero rows when no positives
    return gathered, mask


def parse_box_pred(box_pred):
    """Split the 59-dim box head output into its components.

    Parity: reference parse_output_to_tensors (static_model.py:64-96).
    Returns dict with center_delta (B,3), heading_scores (B,12),
    heading_residuals_normalized/heading_residuals (B,12), size_scores (B,3),
    size_residuals_normalized/size_residuals (B,3,3)."""
    b = box_pred.shape[0]
    c = 3
    center_delta = box_pred[:, :c]
    heading_scores = box_pred[:, c : c + NUM_HEADING_BIN]
    c += NUM_HEADING_BIN
    heading_residuals_normalized = box_pred[:, c : c + NUM_HEADING_BIN]
    heading_residuals = heading_residuals_normalized * (np.pi / NUM_HEADING_BIN)
    c += NUM_HEADING_BIN
    size_scores = box_pred[:, c : c + NUM_SIZE_CLUSTER]
    c += NUM_SIZE_CLUSTER
    size_residuals_normalized = box_pred[:, c : c + 3 * NUM_SIZE_CLUSTER].reshape(
        b, NUM_SIZE_CLUSTER, 3
    )
    size_residuals = size_residuals_normalized * jnp.asarray(
        MEAN_SIZE_ARR, box_pred.dtype
    )
    return {
        "center_delta": center_delta,
        "heading_scores": heading_scores,
        "heading_residuals_normalized": heading_residuals_normalized,
        "heading_residuals": heading_residuals,
        "size_scores": size_scores,
        "size_residuals_normalized": size_residuals_normalized,
        "size_residuals": size_residuals,
    }


def decode_box_pred(parsed, center_base, heading_base):
    """Argmax-decode a parsed box prediction to a 7-dof box (stop-gradient).

    The in-XLA replacement for the reference two-box cascade's mid-forward
    numpy decode (static_model.py:176-205) and the eval-time decode
    (static_eval.py:276-287): heading = class2angle(argmax bin) + heading_base,
    size = class2size(argmax cluster), center = center_delta + center_base."""
    from tdal.core.codecs import class2angle, class2size

    heading_class = jnp.argmax(parsed["heading_scores"], axis=1)
    heading_residual = jnp.take_along_axis(
        parsed["heading_residuals"], heading_class[:, None], axis=1
    )[:, 0]
    size_class = jnp.argmax(parsed["size_scores"], axis=1)
    size_residual = jnp.take_along_axis(
        parsed["size_residuals"], size_class[:, None, None], axis=1
    )[:, 0]
    heading = class2angle(heading_class, heading_residual) + heading_base
    size = class2size(size_class, size_residual)
    box = jnp.concatenate(
        [parsed["center_delta"] + center_base, size, heading[:, None]], axis=1
    )
    return jax.lax.stop_gradient(box)
