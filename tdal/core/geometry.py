"""Pure-JAX box / point-cloud geometry.

Covers the capability surface of the reference's ``det3d/core/bbox/box_np_ops.py``,
``det3d/core/bbox/geometry.py`` and ``det3d/core/bbox/box_torch_ops.py`` (numpy+numba+CUDA)
as fully vectorized, jit/vmap-friendly JAX. Everything here is static-shape and runs as one
XLA program on TPU.

Conventions
-----------
Boxes are ``[x, y, z, l, w, h, heading]`` with z-up, the center at the volumetric center
(``origin=(0.5, 0.5, 0.5)``), ``l`` along the box's local +x at ``heading=0``.

``heading`` is the standard counter-clockwise yaw about +z (the raw Waymo convention used
by the labeler stages). The reference's ``box_np_ops.rotation_2d`` /
``rotation_3d_in_axis`` (box_np_ops.py:146-220) rotate *clockwise* for positive angles
(det3d/KITTI-style negated yaw); detector-convention boxes are handled explicitly via
:func:`kitti_to_waymo_heading` / :func:`waymo_to_kitti_box` instead of baking the sign
quirk into the geometry. ``points_in_rbbox`` here is therefore the geometrically-correct
counterpart of reference ``box_np_ops.points_in_rbbox`` (box_np_ops.py:641-647).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------


def rot_mat_z(angle: jax.Array) -> jax.Array:
    """Counter-clockwise rotation matrix about +z. angle: (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotate_points_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate points CCW about +z by ``angle``.

    points: (..., N, D>=2) — only the first two lanes are rotated.
    angle:  broadcastable to points.shape[:-1].
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = points[..., 0], points[..., 1]
    xr = c * x - s * y
    yr = s * x + c * y
    return jnp.concatenate(
        [jnp.stack([xr, yr], axis=-1), points[..., 2:]], axis=-1
    )


# ---------------------------------------------------------------------------
# Corners
# ---------------------------------------------------------------------------

# Corner layouts mirror reference box_np_ops.corners_nd (box_np_ops.py:55-86):
# 2D: clockwise starting at the (x0, y0) corner -> indices [0,1,3,2] of the
#     unravel ordering, i.e. (-,-), (-,+), (+,+), (+,-) in local half-dims.
_CORNERS2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=np.float32
)
# 3D: unravel ordering [0,1,3,2,4,5,7,6] => bottom/top faces interleaved in z.
_CORNERS3D = np.array(
    [
        [-0.5, -0.5, -0.5],
        [-0.5, -0.5, 0.5],
        [-0.5, 0.5, 0.5],
        [-0.5, 0.5, -0.5],
        [0.5, -0.5, -0.5],
        [0.5, -0.5, 0.5],
        [0.5, 0.5, 0.5],
        [0.5, 0.5, -0.5],
    ],
    dtype=np.float32,
)


def center_to_corner_box2d(
    centers: jax.Array, dims: jax.Array, angles: jax.Array | None = None
) -> jax.Array:
    """BEV box -> 4 corners. centers (..., N, 2), dims (..., N, 2), angles (..., N).

    Returns (..., N, 4, 2). CCW heading (see module docstring)."""
    corners = dims[..., None, :] * jnp.asarray(_CORNERS2D, dims.dtype)
    if angles is not None:
        corners = rotate_points_z(corners, angles[..., None])
    return corners + centers[..., None, :]


def center_to_corner_box3d(
    centers: jax.Array, dims: jax.Array, angles: jax.Array | None = None
) -> jax.Array:
    """3D box -> 8 corners. centers (..., N, 3), dims (..., N, 3) (l, w, h), angles (..., N).

    Returns (..., N, 8, 3) with the corner layout of reference
    box_np_ops.center_to_corner_box3d (box_np_ops.py:241-262), rotation CCW."""
    corners = dims[..., None, :] * jnp.asarray(_CORNERS3D, dims.dtype)
    if angles is not None:
        corners = rotate_points_z(corners, angles[..., None])
    return corners + centers[..., None, :]


def corner_to_standup(corners: jax.Array) -> jax.Array:
    """Axis-aligned bounding box of corners: (..., N, K, D) -> (..., N, 2*D) [mins, maxes]."""
    return jnp.concatenate(
        [corners.min(axis=-2), corners.max(axis=-2)], axis=-1
    )


# ---------------------------------------------------------------------------
# Point-in-box tests
# ---------------------------------------------------------------------------


def points_in_rbbox(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Which points fall inside which rotated 3D boxes (half-space test).

    The TPU-native replacement for reference box_np_ops.points_in_rbbox
    (box_np_ops.py:641-647: corners -> surfaces -> numba point-in-convex-polygon,
    geometry.py:215-278). A centered box is an intersection of 6 axis-aligned
    half-spaces in its local frame, so we rotate points into the box frame and
    compare against half-dims — identical result, fully vectorized.

    points: (N, D>=3); boxes: (M, 7). Returns bool (N, M).
    """
    xyz = points[..., :3]
    d = xyz[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    # World -> box frame: rotate by -heading.
    c = jnp.cos(boxes[:, 6])[None, :]
    s = jnp.sin(boxes[:, 6])[None, :]
    lx = c * d[..., 0] + s * d[..., 1]
    ly = -s * d[..., 0] + c * d[..., 1]
    lz = d[..., 2]
    half = boxes[:, 3:6] * 0.5
    inside = (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(lz) <= half[None, :, 2])
    )
    return inside


def points_count_rbbox(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Number of points inside each box. points (N, D), boxes (M, 7) -> (M,) int32.

    Parity: reference box_np_ops.points_count_rbbox (box_np_ops.py:15-20)."""
    return points_in_rbbox(points, boxes).sum(axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Periods / angles
# ---------------------------------------------------------------------------


def limit_period(val: jax.Array, offset: float = 0.5, period: float = np.pi) -> jax.Array:
    """val - floor(val / period + offset) * period. Parity: box_np_ops.py:360-361."""
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Pose transforms (the most-duplicated function in the reference:
# waymo_common.py:52-65 and 7 copies)
# ---------------------------------------------------------------------------


def transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to (..., N, D>=3) points; extra lanes pass through."""
    xyz = points[..., :3] @ pose[:3, :3].T + pose[:3, 3]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def transform_box(box: jax.Array, pose: jax.Array) -> jax.Array:
    """Transform 7-dof upright boxes (N, 7) by a 4x4 pose.

    heading' = heading + atan2(R[1,0], R[0,0]); center' = R @ center + t.
    Parity: reference transform_box (tools/static_model.py:574-588,
    tools/trackGT.py, waymo_common.py:52-65)."""
    heading = box[..., 6] + jnp.arctan2(pose[1, 0], pose[0, 0])
    center = box[..., :3] @ pose[:3, :3].T + pose[:3, 3]
    return jnp.concatenate(
        [center, box[..., 3:6], heading[..., None]], axis=-1
    )


def transform_box_with_velocity(box: jax.Array, pose: jax.Array) -> jax.Array:
    """Transform 9-dof boxes (N, 9) = [x,y,z,l,w,h,vx,vy,heading] by a 4x4 pose.

    Velocity rotates with R (z component dropped). Parity: reference
    tools/waymo_tracking/test.py:150-172."""
    heading = box[..., 8] + jnp.arctan2(pose[1, 0], pose[0, 0])
    center = box[..., :3] @ pose[:3, :3].T + pose[:3, 3]
    vel3 = jnp.concatenate(
        [box[..., 6:8], jnp.zeros_like(box[..., :1])], axis=-1
    )
    vel = (vel3 @ pose[:3, :3].T)[..., :2]
    return jnp.concatenate(
        [center, box[..., 3:6], vel, heading[..., None]], axis=-1
    )


# ---------------------------------------------------------------------------
# Detector (det3d/KITTI) <-> Waymo box convention
# ---------------------------------------------------------------------------


def kitti_to_waymo_box(box: jax.Array) -> jax.Array:
    """Detector-convention box -> raw Waymo convention.

    The detector stores heading negated-and-shifted and (l, w) swapped relative to
    raw Waymo annotations (reference waymo_common.py:106-111 and
    tools/waymo_tracking/test.py:219-220): heading' = -heading - pi/2, swap dims 3<->4.
    Works for 7-dof (heading last) and 9-dof [.., vx, vy, heading] boxes."""
    heading = -box[..., -1] - np.pi / 2.0
    mid = jnp.concatenate(
        [box[..., [4, 3]], box[..., 5:-1]], axis=-1
    )
    return jnp.concatenate([box[..., :3], mid, heading[..., None]], axis=-1)


def waymo_to_kitti_box(box: jax.Array) -> jax.Array:
    """Inverse of :func:`kitti_to_waymo_box` (the mapping is an involution)."""
    return kitti_to_waymo_box(box)


# ---------------------------------------------------------------------------
# Frustum / misc helpers used by pipelines
# ---------------------------------------------------------------------------


def mask_points_in_range_bev(points: jax.Array, pc_range) -> jax.Array:
    """Points inside an axis-aligned BEV range [x0, y0, z0, x1, y1, z1] -> bool (N,)."""
    pc_range = jnp.asarray(pc_range, points.dtype)
    m = (points[:, 0] >= pc_range[0]) & (points[:, 0] <= pc_range[3])
    m &= (points[:, 1] >= pc_range[1]) & (points[:, 1] <= pc_range[4])
    m &= (points[:, 2] >= pc_range[2]) & (points[:, 2] <= pc_range[5])
    return m


def center_in_range(boxes: jax.Array, pc_range) -> jax.Array:
    """Box centers inside BEV rectangle [x0, y0, x1, y1] -> bool (N,).

    Parity: the post-center-range mask in reference CenterHead.post_processing
    (center_head.py:459-465)."""
    pc_range = jnp.asarray(pc_range, boxes.dtype)
    return (
        (boxes[:, 0] >= pc_range[0])
        & (boxes[:, 0] <= pc_range[2])
        & (boxes[:, 1] >= pc_range[1])
        & (boxes[:, 1] <= pc_range[3])
    )
