"""Heading-bin and size-cluster codecs for the Frustum-PointNet labelers.

Bit-compatible, vectorized JAX ports of the pure functions in reference
``tools/utils.py:53-79`` (angle2class / class2angle / size2class / class2size).
These define the output box parameterization of the static & dynamic labelers:
12 heading bins + residual, 3 size clusters (vehicle / large-vehicle / pedestrian-ish)
+ residual, with MEAN_SIZE_ARR exactly as the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NUM_HEADING_BIN = 12
NUM_SIZE_CLUSTER = 3

# reference tools/utils.py:10-14
MEAN_SIZE_ARR = np.array(
    [
        [4.8, 1.8, 1.5],
        [10.0, 2.6, 3.2],
        [2.0, 1.0, 1.6],
    ],
    dtype=np.float32,
)

TWO_PI = 2.0 * np.pi


def angle2class(angle: jax.Array, num_class: int = NUM_HEADING_BIN):
    """Angle -> (bin id, residual). Parity: tools/utils.py:53-60.

    angle: (...,) radians (any range). Returns (int32 (...,), float (...,))."""
    angle = jnp.mod(angle, TWO_PI)
    angle_per_class = TWO_PI / float(num_class)
    shifted = jnp.mod(angle + angle_per_class / 2.0, TWO_PI)
    class_id = jnp.floor(shifted / angle_per_class).astype(jnp.int32)
    # Guard the shifted == 2*pi boundary exactly like int() truncation would.
    class_id = jnp.clip(class_id, 0, num_class - 1)
    residual = shifted - (
        class_id.astype(angle.dtype) * angle_per_class + angle_per_class / 2.0
    )
    return class_id, residual


def class2angle(
    class_id: jax.Array,
    residual: jax.Array,
    num_class: int = NUM_HEADING_BIN,
    to_label_format: bool = True,
):
    """(bin id, residual) -> angle. Parity: tools/utils.py:69-75."""
    angle_per_class = TWO_PI / float(num_class)
    angle = class_id.astype(residual.dtype) * angle_per_class + residual
    if to_label_format:
        angle = jnp.where(angle > np.pi, angle - TWO_PI, angle)
    return angle


def size2class(lwh: jax.Array):
    """Box dims (..., 3) -> (cluster id (...,), residual (..., 3)).

    Nearest mean size by L2 distance. Parity: tools/utils.py:62-67."""
    mean = jnp.asarray(MEAN_SIZE_ARR, lwh.dtype)
    diff = lwh[..., None, :] - mean  # (..., 3, 3)
    dist = jnp.linalg.norm(diff, axis=-1)
    class_id = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    residual = lwh - mean[class_id]
    return class_id, residual


def class2size(class_id: jax.Array, residual: jax.Array) -> jax.Array:
    """(cluster id, residual (..., 3)) -> dims (..., 3). Parity: tools/utils.py:77-79."""
    mean = jnp.asarray(MEAN_SIZE_ARR, residual.dtype)
    return mean[class_id] + residual
