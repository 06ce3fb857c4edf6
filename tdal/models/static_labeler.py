"""Static-object auto-labeler (Frustum-PointNet over merged track points), TPU-native.

Capability parity with reference ``tools/static_model.py``:
- ``StaticLabelerOneBox``  ~ StaticModelOneBoxEst (static_model.py:108-146)
- ``StaticLabelerTwoBox``  ~ StaticModelTwoBoxEst (static_model.py:148-239)
- ``frustum_loss_one_box`` ~ FrustumPointNetLossOneBoxEst (static_model.py:348-425)
- ``frustum_loss_two_box`` ~ FrustumPointNetLossTwoBoxEst (static_model.py:427-517)

The two-box cascade's mid-forward box-one decode is pure in-XLA ``stop_gradient`` math
here (codecs are vectorized JAX), replacing the reference's GPU->CPU->GPU numpy
round-trip (static_model.py:176-205) — the whole forward is a single XLA program.

Inputs are canonicalized object point sets (B, N, 3) in the init-box frame, the init
box (B, 7) in the labeling frame, and (train only) the GT box (B, 7); see
``tdal.data.track_datasets.StaticTrackDataset``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.codecs import NUM_HEADING_BIN, angle2class
from tdal.models.pointnet import (
    PointNetBoxEst,
    PointNetSeg,
    decode_box_pred,
    gather_object_points,
    parse_box_pred,
)

NUM_OBJECT_POINT = 512  # static_model.py:14
NUM_POINT = 4096  # static_model.py:15


class StaticLabelerOneBox(nn.Module):
    """Instance-seg PointNet -> object-point gather -> single box-estimation head."""

    n_object_points: int = NUM_OBJECT_POINT
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, init_box, bbox_gt=None, train: bool = False):
        """pts (B, N, 3), init_box (B, 7). Returns output dict (see reference :131-145)."""
        logits = PointNetSeg(axis_name=self.axis_name, dtype=self.dtype)(pts, train)
        rng = self.make_rng("gather") if train else None
        object_pts, mask = gather_object_points(
            pts[..., :3], logits, self.n_object_points, rng
        )
        box_pred = PointNetBoxEst(axis_name=self.axis_name, dtype=self.dtype)(
            object_pts, train
        )
        out = parse_box_pred(box_pred)
        out["logits"] = logits
        out["mask"] = mask
        out["center_boxnet"] = out["center_delta"]
        out["center"] = out["center_delta"] + init_box[:, :3]
        return out


class StaticLabelerTwoBox(nn.Module):
    """Cascaded two-box estimation: head one refines the init box, points are
    re-canonicalized into box one's frame, head two refines again.

    Parity: StaticModelTwoBoxEst (static_model.py:148-239). The box-one decode and
    point re-canonicalization run in-XLA under stop_gradient."""

    n_object_points: int = NUM_OBJECT_POINT
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, init_box, bbox_gt=None, train: bool = False):
        logits = PointNetSeg(axis_name=self.axis_name, dtype=self.dtype)(pts, train)
        rng = self.make_rng("gather") if train else None
        object_pts, mask = gather_object_points(
            pts[..., :3], logits, self.n_object_points, rng
        )

        # ---- Box estimation one (in the init-box canonical frame) ----
        box_pred_one = PointNetBoxEst(axis_name=self.axis_name, dtype=self.dtype)(
            object_pts, train
        )
        one = parse_box_pred(box_pred_one)
        center_one = one["center_delta"] + init_box[:, :3]

        # ---- Decode box one (stop-gradient; reference :176-205 does this on CPU) ----
        box_one = decode_box_pred(
            {**one, "center_delta": jax.lax.stop_gradient(center_one)},
            center_base=jnp.zeros_like(center_one),
            heading_base=init_box[:, 6],
        )  # (B, 7) in the labeling frame

        # ---- Re-canonicalize object points: init-box frame -> box-one frame ----
        # Reference :196-200: world = rotz(init_heading) @ p + init_center, then
        # p' = rotz(-box_one_heading) @ (world - box_one_center).
        def recanon(p, ib, b1):
            ci, si = jnp.cos(ib[6]), jnp.sin(ib[6])
            x = ci * p[:, 0] - si * p[:, 1] + ib[0]
            y = si * p[:, 0] + ci * p[:, 1] + ib[1]
            z = p[:, 2] + ib[2]
            x, y, z = x - b1[0], y - b1[1], z - b1[2]
            c1, s1 = jnp.cos(-b1[6]), jnp.sin(-b1[6])
            return jnp.stack([c1 * x - s1 * y, s1 * x + c1 * y, z], axis=-1)

        object_pts_two = jax.vmap(recanon)(
            jax.lax.stop_gradient(object_pts), init_box, box_one
        )

        # ---- Box estimation two ----
        box_pred_two = PointNetBoxEst(axis_name=self.axis_name, dtype=self.dtype)(
            object_pts_two, train
        )
        two = parse_box_pred(box_pred_two)
        center_two = two["center_delta"] + center_one

        out = {
            "logits": logits,
            "mask": mask,
            "center_one": center_one,
            "box_one": box_one,
            "center_two": center_two,
            # final-head aliases (reference :233-238)
            "center": center_two,
        }
        for k in (
            "heading_scores",
            "heading_residuals_normalized",
            "heading_residuals",
            "size_scores",
            "size_residuals_normalized",
            "size_residuals",
        ):
            out[k + "_one"] = one[k]
            out[k + "_two"] = two[k]
            out[k] = two[k]

        # Labels for head two, relative to box one (reference :207-212).
        if bbox_gt is not None:
            h2_cls, h2_res = angle2class(bbox_gt[:, 6] - box_one[:, 6])
            out["heading_class_label_two"] = h2_cls
            out["heading_residuals_label_two"] = h2_res
        return out


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def huber(error, delta: float = 1.0):
    """Elementwise-then-mean huber. Parity: static_model.py:341-346."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return jnp.mean(0.5 * quadratic**2 + delta * linear)


def _seg_loss(logits, mask_label):
    logp = jax.nn.log_softmax(logits.reshape(-1, 2), axis=1)
    labels = mask_label.reshape(-1).astype(jnp.int32)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def _box_terms(
    center,
    heading_scores,
    heading_residuals_normalized,
    size_scores,
    size_residuals_normalized,
    center_label,
    heading_class_label,
    heading_residuals_label,
    size_class_label,
    size_residuals_label,
):
    """The center/heading/size loss terms shared by every labeler head.

    Parity: FrustumPointNetLossOneBoxEst body (static_model.py:383-412)."""
    from tdal.core.codecs import MEAN_SIZE_ARR, NUM_SIZE_CLUSTER

    center_dist = jnp.linalg.norm(center - center_label, axis=1)
    center_loss = huber(center_dist, delta=2.0)

    h_logp = jax.nn.log_softmax(heading_scores, axis=1)
    heading_class_loss = -jnp.mean(
        jnp.take_along_axis(h_logp, heading_class_label[:, None].astype(jnp.int32), axis=1)
    )
    h_onehot = jax.nn.one_hot(heading_class_label, NUM_HEADING_BIN)
    h_res_norm_label = heading_residuals_label / (np.pi / NUM_HEADING_BIN)
    h_res_norm_pred = jnp.sum(heading_residuals_normalized * h_onehot, axis=1)
    heading_res_loss = huber(h_res_norm_pred - h_res_norm_label, delta=1.0)

    s_logp = jax.nn.log_softmax(size_scores, axis=1)
    size_class_loss = -jnp.mean(
        jnp.take_along_axis(s_logp, size_class_label[:, None].astype(jnp.int32), axis=1)
    )
    s_onehot = jax.nn.one_hot(size_class_label, NUM_SIZE_CLUSTER)  # (B, 3)
    s_res_norm_pred = jnp.sum(
        size_residuals_normalized * s_onehot[:, :, None], axis=1
    )  # (B, 3)
    mean_size_label = s_onehot @ jnp.asarray(MEAN_SIZE_ARR, size_scores.dtype)
    s_res_norm_label = size_residuals_label / mean_size_label
    size_dist = jnp.linalg.norm(s_res_norm_label - s_res_norm_pred, axis=1)
    size_res_loss = huber(size_dist, delta=1.0)

    return center_loss, heading_class_loss, heading_res_loss, size_class_loss, size_res_loss


def frustum_loss_one_box(output, labels, w_box: float = 1.0):
    """labels: dict with mask_label (B,N), center_label (B,3), heading_class_label (B,),
    heading_residuals_label (B,), size_class_label (B,), size_residuals_label (B,3).

    Parity: FrustumPointNetLossOneBoxEst (static_model.py:348-425); also serves the
    dynamic labeler (DynamicModelLoss, dynamic_model.py:321-398 — identical structure)."""
    mask_loss = _seg_loss(output["logits"], labels["mask_label"])
    c, hc, hr, sc, sr = _box_terms(
        output["center"],
        output["heading_scores"],
        output["heading_residuals_normalized"],
        output["size_scores"],
        output["size_residuals_normalized"],
        labels["center_label"],
        labels["heading_class_label"],
        labels["heading_residuals_label"],
        labels["size_class_label"],
        labels["size_residuals_label"],
    )
    total = mask_loss + w_box * (c * 10 + hc + sc + hr * 20 + sr * 20)
    return {
        "total_loss": total,
        "mask_loss": mask_loss,
        "center_loss": w_box * c * 10,
        "heading_class_loss": w_box * hc,
        "size_class_loss": w_box * sc,
        "heading_residuals_normalized_loss": w_box * hr * 20,
        "size_residuals_normalized_loss": w_box * sr * 20,
    }


def frustum_loss_two_box(output, labels, w_box: float = 1.0):
    """Parity: FrustumPointNetLossTwoBoxEst (static_model.py:427-517)."""
    mask_loss = _seg_loss(output["logits"], labels["mask_label"])
    c1, hc1, hr1, sc1, sr1 = _box_terms(
        output["center_one"],
        output["heading_scores_one"],
        output["heading_residuals_normalized_one"],
        output["size_scores_one"],
        output["size_residuals_normalized_one"],
        labels["center_label"],
        labels["heading_class_label"],
        labels["heading_residuals_label"],
        labels["size_class_label"],
        labels["size_residuals_label"],
    )
    c2, hc2, hr2, sc2, sr2 = _box_terms(
        output["center_two"],
        output["heading_scores_two"],
        output["heading_residuals_normalized_two"],
        output["size_scores_two"],
        output["size_residuals_normalized_two"],
        labels["center_label"],
        output["heading_class_label_two"],
        output["heading_residuals_label_two"],
        labels["size_class_label"],
        labels["size_residuals_label"],
    )
    total = mask_loss + w_box * (
        c1 * 10 + hc1 + sc1 + hr1 * 20 + sr1 * 20
        + c2 * 10 + hc2 + sc2 + hr2 * 20 + sr2 * 20
    )
    return {
        "total_loss": total,
        "mask_loss": mask_loss,
        "center_loss_one": w_box * c1 * 10,
        "center_loss_two": w_box * c2 * 10,
        "heading_class_loss_one": w_box * hc1,
        "heading_class_loss_two": w_box * hc2,
        "size_class_loss_one": w_box * sc1,
        "size_class_loss_two": w_box * sc2,
        "heading_residuals_normalized_loss_one": w_box * hr1 * 20,
        "heading_residuals_normalized_loss_two": w_box * hr2 * 20,
        "size_residuals_normalized_loss_one": w_box * sr1 * 20,
        "size_residuals_normalized_loss_two": w_box * sr2 * 20,
    }
