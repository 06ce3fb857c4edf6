"""Tests for the Frustum-PointNet labeler models, losses, and train engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdal.models import (
    DynamicLabeler,
    StaticLabelerOneBox,
    StaticLabelerTwoBox,
    dynamic_loss,
    frustum_loss_one_box,
    frustum_loss_two_box,
)
from tdal.models.pointnet import gather_object_points, parse_box_pred
from tdal.pipeline.labeler_engine import make_steps
from tdal.runtime.schedules import adam_with_schedule, labeler_step_decay
from tdal.runtime.train_state import TrainState, init_model

B, N, NOBJ = 4, 128, 32


def _static_batch(key):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (B, N, 3))
    init_box = jnp.tile(jnp.array([0.0, 0.0, 0.0, 4.8, 1.8, 1.5, 0.0]), (B, 1))
    bbox_gt = init_box.at[:, :3].add(0.2)
    return {
        "pts": pts,
        "init_box": init_box,
        "bbox_gt": bbox_gt,
        "mask_label": (jax.random.uniform(k2, (B, N)) > 0.5).astype(jnp.float32),
        "center_label": bbox_gt[:, :3],
        "heading_class_label": jnp.zeros((B,), jnp.int32),
        "heading_residuals_label": jnp.zeros((B,)),
        "size_class_label": jnp.zeros((B,), jnp.int32),
        "size_residuals_label": jnp.zeros((B, 3)),
    }


def test_gather_object_points_semantics():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (2, 16, 3))
    # Sample 0: 5 positives; sample 1: none.
    logits = jnp.zeros((2, 16, 2))
    logits = logits.at[0, :5, 1].set(1.0)
    gathered, mask = gather_object_points(pts, logits, 8)
    assert gathered.shape == (2, 8, 3)
    assert bool(mask[0, :5].all()) and not bool(mask[0, 5:].any())
    # Positives duplicated cyclically: slots 5..7 repeat 0..2.
    np.testing.assert_allclose(gathered[0, 5:], gathered[0, :3], atol=1e-6)
    gathered_set = {tuple(np.round(np.asarray(p), 5)) for p in gathered[0]}
    expected = {tuple(np.round(np.asarray(p), 5)) for p in pts[0, :5]}
    assert gathered_set == expected
    # No positives -> all zeros (reference static_model.py:36-47 leaves zeros).
    np.testing.assert_allclose(np.asarray(gathered[1]), 0.0)


def test_gather_subsampling_uses_only_positives():
    key = jax.random.PRNGKey(1)
    pts = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    logits = jnp.zeros((2, 16, 2)).at[:, ::2, 1].set(1.0)  # 8 positives of 16
    gathered, _ = gather_object_points(pts, logits, 4, rng=key)
    pos = np.asarray(pts[:, ::2]).reshape(2, -1, 3)
    for b in range(2):
        rows = {tuple(r) for r in np.asarray(gathered[b]).round(4)}
        allowed = {tuple(r) for r in pos[b].round(4)}
        assert rows <= allowed and len(rows) == 4  # distinct, all positive


def test_parse_box_pred_shapes():
    box_pred = jnp.arange(2 * 59, dtype=jnp.float32).reshape(2, 59)
    out = parse_box_pred(box_pred)
    assert out["center_delta"].shape == (2, 3)
    assert out["heading_scores"].shape == (2, 12)
    assert out["size_residuals"].shape == (2, 3, 3)
    # residual scaling: heading residual = normalized * pi/12
    np.testing.assert_allclose(
        np.asarray(out["heading_residuals"]),
        np.asarray(out["heading_residuals_normalized"]) * np.pi / 12,
        rtol=1e-6,
    )


@pytest.mark.parametrize(
    "model_cls,loss_fn",
    [
        (StaticLabelerOneBox, frustum_loss_one_box),
        (StaticLabelerTwoBox, frustum_loss_two_box),
    ],
)
def test_static_labeler_trains(model_cls, loss_fn):
    key = jax.random.PRNGKey(0)
    batch = _static_batch(key)
    model = model_cls(n_object_points=NOBJ)
    params, bs = init_model(
        model,
        {"params": key, "gather": key, "dropout": key},
        batch["pts"],
        batch["init_box"],
        batch["bbox_gt"],
    )
    tx = adam_with_schedule(labeler_step_decay(1e-3, 100), weight_decay=1e-4)
    state = TrainState.create(params, tx, bs)
    inputs_fn = lambda b: (b["pts"], b["init_box"], b["bbox_gt"])
    train_step, eval_step = make_steps(model, loss_fn, inputs_fn, donate=False)

    m0 = None
    for i in range(8):
        state, m = train_step(state, batch, key)
        if m0 is None:
            m0 = float(m["total_loss"])
    assert float(m["total_loss"]) < m0  # loss decreases on a fixed batch
    em, out = eval_step(state, batch)
    assert np.isfinite(float(em["total_loss"]))
    assert out["center"].shape == (B, 3)
    assert 0.0 <= float(em["seg_acc"]) <= 1.0


def test_dynamic_labeler_trains():
    key = jax.random.PRNGKey(0)
    base = _static_batch(key)
    npts = 5 * NOBJ
    batch = dict(
        base,
        pts=jax.random.normal(key, (B, npts, 4)),
        boxes=jax.random.normal(key, (B, 101, 8)),
        mask_label=(jax.random.uniform(key, (B, npts)) > 0.5).astype(jnp.float32),
        center_label=jnp.full((B, 3), 0.2),
    )
    model = DynamicLabeler(n_object_points=NOBJ)
    params, bs = init_model(
        model,
        {"params": key, "gather": key, "dropout": key},
        batch["pts"],
        batch["boxes"],
        batch["bbox_gt"],
    )
    tx = adam_with_schedule(labeler_step_decay(1e-3, 100))
    state = TrainState.create(params, tx, bs)
    inputs_fn = lambda b: (b["pts"], b["boxes"], b["bbox_gt"])
    train_step, eval_step = make_steps(model, dynamic_loss, inputs_fn, donate=False)
    m0 = None
    for _ in range(8):
        state, m = train_step(state, batch, key)
        if m0 is None:
            m0 = float(m["total_loss"])
    assert float(m["total_loss"]) < m0
    # Dynamic head predicts a center *delta* (dynamic_model.py:143-147).
    _, out = eval_step(state, batch)
    assert out["center"].shape == (B, 3)


def test_two_box_labels_match_reference_semantics():
    """heading_class_label_two must encode bbox_gt heading relative to box one."""
    key = jax.random.PRNGKey(0)
    batch = _static_batch(key)
    model = StaticLabelerTwoBox(n_object_points=NOBJ)
    variables = model.init(
        {"params": key, "gather": key, "dropout": key},
        batch["pts"],
        batch["init_box"],
        batch["bbox_gt"],
    )
    out = model.apply(variables, batch["pts"], batch["init_box"], batch["bbox_gt"])
    from tdal.core.codecs import class2angle

    recon = class2angle(
        out["heading_class_label_two"], out["heading_residuals_label_two"]
    )
    expect = np.asarray(batch["bbox_gt"][:, 6] - out["box_one"][:, 6])
    # angles equal mod 2pi
    d = np.asarray(recon) - expect
    d = (d + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_sharded_train_step_8dev():
    """Train step under an 8-device mesh with the batch sharded over 'data'."""
    from tdal.parallel.mesh import batch_sharding, make_mesh, shard_batch

    key = jax.random.PRNGKey(0)
    batch = _static_batch(key)
    batch = {k: jnp.concatenate([v, v], 0) for k, v in batch.items()}  # B=8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    model = StaticLabelerOneBox(n_object_points=NOBJ)
    params, bs = init_model(
        model,
        {"params": key, "gather": key, "dropout": key},
        batch["pts"],
        batch["init_box"],
        batch["bbox_gt"],
    )
    tx = adam_with_schedule(labeler_step_decay(1e-3, 100))
    state = TrainState.create(params, tx, bs)
    inputs_fn = lambda b: (b["pts"], b["init_box"], b["bbox_gt"])
    train_step, _ = make_steps(model, frustum_loss_one_box, inputs_fn, donate=False)
    sharded = shard_batch(batch, mesh)
    assert sharded["pts"].sharding == batch_sharding(mesh)
    state2, m = train_step(state, sharded, key)
    assert np.isfinite(float(m["total_loss"]))
    # params remain replicated-compatible
    assert int(state2.step) == 1
    # GSPMD equivalence: the sharded step computes the same loss as single-device
    # (global BN stats + implicit gradient psum == unsharded math).
    state3, m_single = train_step(state, batch, key)
    np.testing.assert_allclose(
        float(m["total_loss"]), float(m_single["total_loss"]), rtol=2e-4
    )
