"""Dynamic-object auto-labeler: per-frame Frustum-PointNet + box-trajectory embedding.

Capability parity with reference ``tools/dynamic_model.py``:
- ``DynamicLabeler``    ~ DynamicModel (dynamic_model.py:109-155): instance-seg PointNet
  over a 5-frame, 4-channel (xyz + frame-time) point window -> gather 5*512 object
  points -> 256-d point embedding || 128-d embedding of the 101-box (+-50 frame,
  7 box + time) trajectory -> MLP box head (59 out).
- ``dynamic_loss``      ~ DynamicModelLoss (dynamic_model.py:321-398) — structurally the
  one-box frustum loss; re-exported from static_labeler.

The predicted center is a *delta* from the init (center-frame) box; eval adds it back
(dynamic_eval.py postprocessing). Inputs are canonicalized into the center-frame box's
frame by ``tdal.data.track_datasets.DynamicTrackDataset``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tdal.models.pointnet import (
    BOX_PRED_DIM,
    DenseBNStack,
    PointNetSeg,
    SharedMLP,
    gather_object_points,
    parse_box_pred,
)
from tdal.models.static_labeler import frustum_loss_one_box

NUM_POINT = 1024  # points per frame (dynamic_model.py:15)
NUM_FRAME = 5  # +-2 frame window (dynamic_model.py:16)
NUM_OBJECT_POINT = 512  # gathered object points per frame (dynamic_model.py:14)
BOX_SEQ_LEN = 101  # +-50 frame box trajectory (dynamic_model.py:115-116)


class PointEmbedding(nn.Module):
    """Object-point-window -> 256-d embedding.

    Parity: reference PointEmbedding (dynamic_model.py:214-249): shared MLP
    (64,128,256,512) -> max-pool -> FC(512)+BN+ReLU -> FC(256)+BN+ReLU."""

    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        x = SharedMLP([64, 128, 256, 512], axis_name=self.axis_name, dtype=self.dtype)(
            pts, train
        )
        x = jnp.max(x, axis=1)
        return DenseBNStack([512, 256], axis_name=self.axis_name, dtype=self.dtype)(
            x, train
        )


class BoxEmbedding(nn.Module):
    """Box-trajectory (B, 101, 8) -> 128-d embedding.

    Parity: reference BoxEmbedding (dynamic_model.py:251-286): shared MLP
    (64,64,128,512) -> max-pool -> FC(128)+BN+ReLU x2."""

    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes, train: bool = False):
        x = SharedMLP([64, 64, 128, 512], axis_name=self.axis_name, dtype=self.dtype)(
            boxes, train
        )
        x = jnp.max(x, axis=1)
        return DenseBNStack([128, 128], axis_name=self.axis_name, dtype=self.dtype)(
            x, train
        )


class EmbeddingBoxHead(nn.Module):
    """(B, 384) embedding -> 59-dim box prediction.

    Parity: reference dynamic PointNetEstimation (dynamic_model.py:288-312)."""

    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, train: bool = False):
        x = DenseBNStack([128, 128], axis_name=self.axis_name, dtype=self.dtype)(
            emb, train
        )
        return nn.Dense(BOX_PRED_DIM, dtype=self.dtype)(x)


class DynamicLabeler(nn.Module):
    """pts (B, 5*1024, 4), boxes (B, 101, 8) -> per-frame refined box prediction."""

    n_object_points: int = NUM_FRAME * NUM_OBJECT_POINT
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, boxes, bbox_gt=None, train: bool = False):
        logits = PointNetSeg(axis_name=self.axis_name, dtype=self.dtype)(pts, train)
        rng = self.make_rng("gather") if train else None
        # All 4 channels (xyz + time) are gathered (dynamic_model.py:52-63).
        object_pts, mask = gather_object_points(
            pts, logits, self.n_object_points, rng
        )
        point_e = PointEmbedding(axis_name=self.axis_name, dtype=self.dtype)(
            object_pts, train
        )
        box_e = BoxEmbedding(axis_name=self.axis_name, dtype=self.dtype)(boxes, train)
        emb = jnp.concatenate([point_e, box_e], axis=1)  # (B, 384)
        box_pred = EmbeddingBoxHead(axis_name=self.axis_name, dtype=self.dtype)(
            emb, train
        )
        out = parse_box_pred(box_pred)
        out["logits"] = logits
        out["mask"] = mask
        # Dynamic head predicts the center *delta* directly (dynamic_model.py:143-147).
        out["center"] = out["center_delta"]
        return out


dynamic_loss = frustum_loss_one_box
