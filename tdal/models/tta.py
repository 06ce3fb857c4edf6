"""Double-flip test-time augmentation.

Capability parity with reference:
- dataset side: yflip/xflip/double-flip point-set variants
  (datasets/pipelines/test_aug.DoubleFlip + formating.Reformat double_flip bundles)
- head side: un-flipping + averaging of the 4 prediction maps before decode
  (center_head.predict, center_head.py:316-427).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def double_flip_points(points: np.ndarray):
    """points (N, D) -> [orig, yflip(y=-y), xflip(x=-x), both]. Parity: test_aug.py."""
    yflip = points.copy()
    yflip[:, 1] = -yflip[:, 1]
    xflip = points.copy()
    xflip[:, 0] = -xflip[:, 0]
    both = points.copy()
    both[:, :2] = -both[:, :2]
    return [points, yflip, xflip, both]


def average_double_flip_preds(preds: dict) -> dict:
    """preds: per-task dict of NHWC maps with leading batch B*4 ordered
    [orig, yflip, xflip, double] per sample. Returns maps with batch B.

    Flip math parity: center_head.py:316-427 (torch dims=[1] == H axis == our axis 1).
    """
    out = {}
    shaped = {}
    for k, v in preds.items():
        b4, h, w, c = v.shape
        v = v.reshape(b4 // 4, 4, h, w, c)
        # transform each variant's map back to the original frame
        v = v.at[:, 1].set(jnp.flip(v[:, 1], axis=1))
        v = v.at[:, 2].set(jnp.flip(v[:, 2], axis=2))
        v = v.at[:, 3].set(jnp.flip(v[:, 3], axis=(1, 2)))
        shaped[k] = v

    # The reference activates BEFORE averaging (center_head.py:342-356):
    # mean of sigmoid(hm) and mean of exp(dim), not sigmoid/exp of the mean —
    # different math (arithmetic vs geometric mean of sizes; probability vs
    # logit averaging for scores). The returned hm/dim are therefore already
    # activated; decode with decode_preds(..., activated=True). Pinned by
    # tests/test_torch_parity_detector.py::test_decode_and_double_flip_parity.
    import jax

    out["hm"] = jax.nn.sigmoid(shaped["hm"]).mean(axis=1)
    out["dim"] = jnp.exp(shaped["dim"]).mean(axis=1)
    if "height" in shaped:
        out["height"] = shaped["height"].mean(axis=1)

    reg = shaped["reg"]
    reg = reg.at[:, 1, ..., 1].set(1 - reg[:, 1, ..., 1])
    reg = reg.at[:, 2, ..., 0].set(1 - reg[:, 2, ..., 0])
    reg = reg.at[:, 3, ..., 0].set(1 - reg[:, 3, ..., 0])
    reg = reg.at[:, 3, ..., 1].set(1 - reg[:, 3, ..., 1])
    out["reg"] = reg.mean(axis=1)

    rot = shaped["rot"]  # (..., 2) = (sin-ish, cos-ish)
    rots = rot[..., 0:1]
    rotc = rot[..., 1:2]
    rotc = rotc.at[:, 1].multiply(-1)  # yflip: cos flips
    rots = rots.at[:, 2].multiply(-1)  # xflip: sin flips
    rots = rots.at[:, 3].multiply(-1)  # double: both flip
    rotc = rotc.at[:, 3].multiply(-1)
    out["rot"] = jnp.concatenate(
        [rots.mean(axis=1), rotc.mean(axis=1)], axis=-1
    )

    if "vel" in shaped:
        vel = shaped["vel"]
        vel = vel.at[:, 1, ..., 1].multiply(-1)
        vel = vel.at[:, 2, ..., 0].multiply(-1)
        vel = vel.at[:, 3].multiply(-1)
        out["vel"] = vel.mean(axis=1)
    return out
