"""Factories shared by the labeler CLI tools."""

from __future__ import annotations

import pickle
from pathlib import Path

from tdal.models import (
    DynamicLabeler,
    StaticLabelerOneBox,
    StaticLabelerTwoBox,
    dynamic_loss,
    frustum_loss_one_box,
    frustum_loss_two_box,
)


def make_labeler(model_type: str, n_object_points: int | None = None):
    """model_type in {'one_box_est','two_box_est','dynamic'} ->
    (model, loss_fn, inputs_fn, decode_kind)."""
    if model_type == "one_box_est":
        model = StaticLabelerOneBox(
            **({"n_object_points": n_object_points} if n_object_points else {})
        )
        return (
            model,
            frustum_loss_one_box,
            lambda b: (b["pts"], b["init_box"], b["bbox_gt"]),
            "static_one",
        )
    if model_type == "two_box_est":
        model = StaticLabelerTwoBox(
            **({"n_object_points": n_object_points} if n_object_points else {})
        )
        return (
            model,
            frustum_loss_two_box,
            lambda b: (b["pts"], b["init_box"], b["bbox_gt"]),
            "static_two",
        )
    if model_type == "dynamic":
        model = DynamicLabeler(
            **({"n_object_points": n_object_points} if n_object_points else {})
        )
        return (
            model,
            dynamic_loss,
            lambda b: (b["pts"], b["boxes"], b["bbox_gt"]),
            "dynamic",
        )
    raise ValueError(f"unknown model_type {model_type!r}")


def load_track_data(path: str, split: int = 16, prefix: str | None = None) -> dict:
    """Load a track dict from a single pickle, or merge ``{prefix}_{i}.pkl`` shards
    from a directory (the reference's 16-way train sharding,
    static_train.py:192-198, trackData.py:14-19)."""
    p = Path(path)
    if p.is_file():
        with open(p, "rb") as f:
            return pickle.load(f)
    track: dict = {}
    assert prefix is not None, "prefix required when loading a shard directory"
    for i in range(split):
        shard = p / f"{prefix}_{i}.pkl"
        if not shard.exists():
            continue
        with open(shard, "rb") as f:
            track.update(pickle.load(f))
    return track


def restore_labeler_state(model, ckpt_dir, example_inputs, tx=None, prefer_best=True):
    """Init a model then overlay the best (or latest) checkpoint's params/batch_stats."""
    import jax

    from tdal.runtime.checkpoint import CheckpointManager
    from tdal.runtime.train_state import TrainState, init_model

    key = jax.random.PRNGKey(0)
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key}, *example_inputs
    )
    if tx is None:
        import optax

        tx = optax.adam(1e-3)
    state = TrainState.create(params, tx, bs)
    mgr = CheckpointManager(ckpt_dir)
    step = mgr.best_step() if prefer_best else None
    tree, meta = mgr.restore(step, target={"params": params, "batch_stats": bs})
    return state.replace(params=tree["params"], batch_stats=tree["batch_stats"]), meta
