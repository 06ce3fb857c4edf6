"""Driver-visible detector-quality gate (VERDICT r3 item 5).

The measurable stand-in for the environment-blocked real-Waymo "L2 mAPH within
0.2" target (BASELINE.md): a from-scratch short train of the synthetic
PointPillars config must reach a hard AP floor, guarding the whole train path
(data -> targets -> train step -> decode -> NMS -> eval) against silent
numerics regressions. The same measurement ships as the ``detector_ap_synthetic``
metric in bench.py.

The full-convergence floor runs on the REAL TPU only (the CPU suite's virtual
mesh steps ~14x slower — 30 epochs already exceeded 900 s there, and the hard
floor needs 60). On CPU this file still asserts the cheap invariant that a
briefly-trained model beats an untrained one.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_detector_ap_floor_tpu():
    """Hard floor: 60 epochs from scratch reaches VEHICLE AP@IoU0.3 >= 0.4
    (measured 0.645 on v5e, 2026-08; deterministic seeds)."""
    if jax.default_backend() != "tpu":
        pytest.skip("hard AP floor runs on the real TPU (CPU steps too slow)")
    import bench

    r = bench.measure_detector_ap_synthetic(epochs=60)
    assert r["ap_iou03"] >= 0.4, r


def test_detector_learns_above_zero_cpu():
    """CPU-suite invariant: a short train moves AP strictly above zero on the
    overfit-one-scene task (untrained nets score ~0 by construction)."""
    if jax.default_backend() == "tpu":
        pytest.skip("covered by the stronger TPU floor test")
    import bench

    r = bench.measure_detector_ap_synthetic(epochs=25, n_scenes=1, n_frames=8, bsz=4)
    # measured 0.072 at these settings on the CPU mesh; floor at half that
    assert r["ap_iou03"] >= 0.03, r
