"""Rotated-box IoU in pure JAX — the TPU-native replacement for every IoU backend the
reference uses:

- ``det3d/ops/iou3d_nms`` CUDA kernels (iou3d_nms_kernel.cu:104-265 polygon clipping)
- external pcdet ``boxes_iou3d_gpu`` (GT matching in waymo_common.py:173-188, ROI targets)
- external frustum-pointnet ``provider.box3d_iou`` Shapely corner IoU (tools/utils.py:81-103)

One vectorized convex-intersection routine serves all call sites. The intersection of two
convex quads has <= 8 vertices; we enumerate all 24 candidates (16 edge-pair intersections
+ 2x4 contained vertices), mask validity, order by angle around the valid centroid, and
take a masked shoelace. Fixed shapes, no data-dependent control flow -> jit/vmap-friendly
and MXU/VPU-tileable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tdal.core.geometry import center_to_corner_box2d

_EPS = 1e-8


def _cross2(o, a, b):
    """z of (a - o) x (b - o)."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _segment_intersections(corners_a: jax.Array, corners_b: jax.Array):
    """All 4x4 edge-pair intersection points of two quads.

    corners: (4, 2) each (cyclic vertex order). Returns points (16, 2), valid (16,)."""
    a0 = corners_a  # (4, 2)
    a1 = jnp.roll(corners_a, -1, axis=0)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=0)

    # Pairwise: broadcast A edges x B edges.
    p = a0[:, None, :]  # (4, 1, 2)
    r = (a1 - a0)[:, None, :]
    q = b0[None, :, :]  # (1, 4, 2)
    s = (b1 - b0)[None, :, :]

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (4, 4)
    qmp = q - p
    qpxr = qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]
    qpxs = qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]

    denom = jnp.where(jnp.abs(rxs) < _EPS, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    valid = (
        (jnp.abs(rxs) >= _EPS)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pts = p + t[..., None] * r  # (4, 4, 2)
    return pts.reshape(16, 2), valid.reshape(16)


def _points_in_quad(points: jax.Array, corners: jax.Array) -> jax.Array:
    """points (N, 2) inside convex quad corners (4, 2) (either orientation)."""
    c0 = corners[None, :, :]  # (1, 4, 2)
    c1 = jnp.roll(corners, -1, axis=0)[None, :, :]
    cross = _cross2(c0, c1, points[:, None, :])  # (N, 4)
    return jnp.all(cross >= -_EPS, axis=-1) | jnp.all(cross <= _EPS, axis=-1)


def _ccw(corners: jax.Array) -> jax.Array:
    """Orient a convex quad's 4 corners counter-clockwise."""
    signed = jnp.sum(
        corners[:, 0] * jnp.roll(corners, -1, 0)[:, 1]
        - corners[:, 1] * jnp.roll(corners, -1, 0)[:, 0]
    )
    return jnp.where(signed >= 0, corners, corners[::-1])


def _edge_integral(edges_p, edges_q, clip_corners, boundary_eps):
    """Green's-theorem contribution of directed segments clipped to a convex quad.

    edges_p/edges_q (E, 2): segment endpoints (CCW direction around their polygon);
    clip_corners (4, 2) CCW. Each segment is interval-clipped (Liang-Barsky) against
    the quad's 4 half-planes; the surviving sub-segment contributes
    (x0*y1 - y0*x1)/2 to the signed area. Pure elementwise math — no sort, no
    scatter (TPU scatters serialize; this is the NMS hot primitive)."""
    d = edges_q - edges_p  # (E, 2)
    c0 = clip_corners  # (4, 2)
    c1 = jnp.roll(clip_corners, -1, axis=0)
    n_in = jnp.stack(
        [-(c1[:, 1] - c0[:, 1]), c1[:, 0] - c0[:, 0]], axis=-1
    )  # inward normals of CCW quad (4, 2)
    # signed distance of p to each half-plane, and velocity along d
    sp = jnp.einsum("ek,hk->eh", edges_p, n_in) - jnp.einsum(
        "hk,hk->h", c0, n_in
    )  # (E, 4): >0 inside
    sv = jnp.einsum("ek,hk->eh", d, n_in)  # (E, 4)
    sp = sp + boundary_eps

    # t-interval where the segment is inside half-plane h: sp + t*sv >= 0
    big = 1e9
    safe_sv = jnp.where(jnp.abs(sv) > _EPS, sv, 1.0)
    t_enter = jnp.where(
        sv > _EPS, -sp / safe_sv,
        jnp.where(sv < -_EPS, -big, jnp.where(sp >= 0, -big, big)),
    )
    t_exit = jnp.where(
        sv < -_EPS, -sp / safe_sv,
        jnp.where(sv > _EPS, big, jnp.where(sp >= 0, big, -big)),
    )
    t0 = jnp.clip(jnp.max(t_enter, axis=1), 0.0, 1.0)
    t1 = jnp.clip(jnp.min(t_exit, axis=1), 0.0, 1.0)
    valid = t1 > t0
    p0 = edges_p + t0[:, None] * d
    p1 = edges_p + t1[:, None] * d
    contrib = p0[:, 0] * p1[:, 1] - p0[:, 1] * p1[:, 0]
    return 0.5 * jnp.sum(jnp.where(valid, contrib, 0.0))


def quad_intersection_area(corners_a: jax.Array, corners_b: jax.Array) -> jax.Array:
    """Intersection area of two convex quads, each (4, 2). Returns scalar.

    The boundary of A∩B consists of the parts of A's edges inside B plus the parts
    of B's edges inside A; the shoelace line integral decomposes over those directed
    segments independent of traversal order, so no intersection polygon is ever
    constructed. B's edges are clipped with a slightly *shrunk* A so a shared
    boundary (identical/touching boxes) is counted once."""
    a = _ccw(corners_a)
    b = _ccw(corners_b)
    area = _edge_integral(a, jnp.roll(a, -1, 0), b, 1e-5) + _edge_integral(
        b, jnp.roll(b, -1, 0), a, -1e-5
    )
    return jnp.maximum(area, 0.0)


def _pair_overlap_bev(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """BEV intersection area of two [x, y, l, w, heading] boxes (CCW heading)."""
    ca = center_to_corner_box2d(box_a[None, :2], box_a[None, 2:4], box_a[None, 4])[0]
    cb = center_to_corner_box2d(box_b[None, :2], box_b[None, 2:4], box_b[None, 4])[0]
    return quad_intersection_area(ca, cb)


def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise BEV intersection areas. boxes (N, 7) / (M, 7) -> (N, M).

    Parity: reference boxes_overlap_bev_gpu (iou3d_nms_kernel.cu:236-249)."""
    bev_a = boxes_a[:, [0, 1, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 1, 3, 4, 6]]
    f = jax.vmap(lambda a: jax.vmap(lambda b: _pair_overlap_bev(a, b))(bev_b))
    return f(bev_a)


def boxes_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise rotated BEV IoU. boxes (N, 7), (M, 7) -> (N, M).

    Parity: reference boxes_iou_bev_gpu (iou3d_nms_kernel.cu:251-265)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, _EPS, None)


def boxes_iou_3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise 3D IoU of [x, y, z, l, w, h, heading] boxes, z at volumetric center.

    Parity: pcdet-style boxes_iou3d_gpu as called for GT matching
    (waymo_common.py:176-188) and ROI target assignment
    (proposal_target_layer.py). boxes (N, 7), (M, 7) -> (N, M)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za_max = boxes_a[:, 2] + boxes_a[:, 5] / 2.0
    za_min = boxes_a[:, 2] - boxes_a[:, 5] / 2.0
    zb_max = boxes_b[:, 2] + boxes_b[:, 5] / 2.0
    zb_min = boxes_b[:, 2] - boxes_b[:, 5] / 2.0
    overlap_h = jnp.clip(
        jnp.minimum(za_max[:, None], zb_max[None, :])
        - jnp.maximum(za_min[:, None], zb_min[None, :]),
        0.0,
        None,
    )
    inter = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, _EPS, None)


# ---------------------------------------------------------------------------
# Labeler-metric corner IoU (frustum-pointnet provider semantics)
# ---------------------------------------------------------------------------


def labeler_box3d_iou(boxes_a: jax.Array, boxes_b: jax.Array):
    """Elementwise (iou3d, iou2d) with frustum-pointnet ``box3d_iou`` semantics.

    The reference labelers measure IoU through the external fpointnet provider
    (tools/utils.py:81-103): ``get_3d_box`` builds corners with a rotation about the
    *y* axis, so for lidar boxes [x, y, z, l, w, h, heading] the footprint polygon lives
    in the (x, z) plane — dims (l, w) centered at (x, z), rotated clockwise by heading —
    and the "vertical" extent is y +- h/2. We reproduce those semantics exactly so the
    labeler metrics are comparable with the reference's, quirk included.

    boxes: (..., 7) each. Returns (iou3d (...,), iou2d (...,))."""
    flat_a = boxes_a.reshape(-1, 7)
    flat_b = boxes_b.reshape(-1, 7)

    def one(a, b):
        # Footprint: (x, z) center, (l, w) dims, clockwise rotation == CCW of -heading.
        fa = jnp.stack([a[0], a[2], a[3], a[4], -a[6]])
        fb = jnp.stack([b[0], b[2], b[3], b[4], -b[6]])
        inter_area = _pair_overlap_bev(fa, fb)
        area_a = a[3] * a[4]
        area_b = b[3] * b[4]
        iou2d = inter_area / jnp.clip(area_a + area_b - inter_area, _EPS, None)
        ymax = jnp.minimum(a[1] + a[5] / 2.0, b[1] + b[5] / 2.0)
        ymin = jnp.maximum(a[1] - a[5] / 2.0, b[1] - b[5] / 2.0)
        inter_vol = inter_area * jnp.clip(ymax - ymin, 0.0, None)
        vol_a = a[3] * a[4] * a[5]
        vol_b = b[3] * b[4] * b[5]
        iou3d = inter_vol / jnp.clip(vol_a + vol_b - inter_vol, _EPS, None)
        return iou3d, iou2d

    iou3d, iou2d = jax.vmap(one)(flat_a, flat_b)
    return iou3d.reshape(boxes_a.shape[:-1]), iou2d.reshape(boxes_a.shape[:-1])


def compute_box3d_iou(
    center_pred,
    heading_logits,
    heading_residuals,
    size_logits,
    size_residuals,
    center_label,
    heading_class_label,
    heading_residual_label,
    size_class_label,
    size_residual_label,
):
    """Decode labeler outputs + labels to boxes and measure corner IoU.

    Vectorized parity of reference tools/utils.py:81-103 (argmax decode of heading
    bin / size cluster, then fpointnet corner IoU). Returns (iou2d (B,), iou3d (B,))."""
    from tdal.core.codecs import class2angle, class2size

    heading_class = jnp.argmax(heading_logits, axis=1)
    heading_residual = jnp.take_along_axis(
        heading_residuals, heading_class[:, None], axis=1
    )[:, 0]
    size_class = jnp.argmax(size_logits, axis=1)
    size_residual = jnp.take_along_axis(
        size_residuals, size_class[:, None, None], axis=1
    )[:, 0]

    heading = class2angle(heading_class, heading_residual)
    size = class2size(size_class, size_residual)
    box_pred = jnp.concatenate([center_pred, size, heading[:, None]], axis=1)

    heading_l = class2angle(heading_class_label, heading_residual_label)
    size_l = class2size(size_class_label, size_residual_label)
    box_label = jnp.concatenate([center_label, size_l, heading_l[:, None]], axis=1)

    iou3d, iou2d = labeler_box3d_iou(box_pred, box_label)
    return iou2d, iou3d
