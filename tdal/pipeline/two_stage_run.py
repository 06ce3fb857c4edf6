"""Two-stage training / inference drivers (config-driven, used by tools/*).

Capability parity with the reference's finetune flow for
configs/waymo/*/two_stage/*_freeze*.py: load the pretrained first-stage checkpoint
(single_stage.py:33-40), freeze it (FrozenBatchNorm + no grads -> here an optax mask,
two_stage_engine.make_frozen_tx), train the RoIHead on proposal targets, and run
sqrt-rescored two-stage inference.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from tdal.pipeline.detector_run import detection_batches
from tdal.pipeline.two_stage_engine import TwoStageEngine, make_frozen_tx
from tdal.runtime.checkpoint import CheckpointManager
from tdal.runtime.logging_utils import LogBuffer
from tdal.runtime.train_state import TrainState


def init_two_stage_state(engine: TwoStageEngine, cfg, tx, points, gt_boxes_and_cls, rng, logger):
    """Init both stages; overlay the pretrained first-stage checkpoint when the
    config names one (first_stage_cfg.pretrained)."""
    params, bs = engine.init(rng, points, gt_boxes_and_cls)
    pretrained = cfg.model["first_stage_cfg"].get("pretrained")
    if pretrained:
        try:
            mgr = CheckpointManager(pretrained)
            tree, meta = mgr.restore(
                target={"params": params["first"], "batch_stats": bs["first"]}
            )
            params = dict(params, first=tree["params"])
            bs = dict(bs, first=tree["batch_stats"])
            logger.info(f"loaded pretrained first stage from {pretrained}: {meta}")
        except FileNotFoundError:
            logger.warning(f"pretrained first stage not found at {pretrained}")
    if engine.freeze_first:
        tx = make_frozen_tx(tx)
    return TrainState.create(params, tx, bs)


def train_two_stage(engine: TwoStageEngine, cfg, train_ds, tx, batch_size, n_epoch, logger, work_dir, rng, mesh=None, seed: int = 0, log_every: int = 10):
    import jax.numpy as jnp

    from tdal.parallel.mesh import shard_batch

    example = train_ds[0]
    points = jnp.asarray(np.stack([example["points"]] * batch_size))
    gt = jnp.asarray(np.stack([example["gt_boxes_and_cls"]] * batch_size))
    state = init_two_stage_state(engine, cfg, tx, points, gt, rng, logger)

    train_step, _ = engine.make_steps()
    mgr = CheckpointManager(Path(work_dir) / "checkpoints")
    buf = LogBuffer()
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    for epoch in range(n_epoch):
        t0 = time.time()
        for i, batch in enumerate(
            detection_batches(train_ds, batch_size, shuffle=True, seed=seed + epoch)
        ):
            batch.pop("n_valid", None)
            batch.pop("token", None)
            batch = {
                k: ([jnp.asarray(x) for x in v] if isinstance(v, list) else jnp.asarray(v))
                for k, v in batch.items()
            }
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, logs = train_step(state, batch, rng)
            buf.update({k: float(v) for k, v in logs.items()})
            if (i + 1) % log_every == 0:
                buf.average(log_every)
                msg = ", ".join(f"{k}: {v:.4f}" for k, v in buf.output.items())
                logger.info(f"Epoch [{epoch + 1}/{n_epoch}][{i + 1}/{steps_per_epoch}] {msg}")
                buf.clear_output()
        logger.info(f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s")
        mgr.save(
            int(state.step),
            {"params": state.params, "batch_stats": state.batch_stats},
            meta={"epoch": epoch + 1},
        )
    return state


def run_two_stage_inference(engine: TwoStageEngine, state, dataset, batch_size, logger, speed_test: bool = False):
    """Inference -> {token: {box3d_lidar, scores, label_preds}} with the two-stage
    sqrt rescoring. Parity: dist_test over a TwoStageDetector config."""
    import jax.numpy as jnp

    from tdal.pipeline.detector_engine import predictions_to_host

    from tdal.utils.timing import force_completion

    _, predict_step = engine.make_steps(donate=False)
    detections = {}
    n_batches = (len(dataset) + batch_size - 1) // batch_size
    start_idx, times = n_batches // 3, []
    # Same software pipeline as detector_run.run_inference: fetch batch i-1's
    # outputs while batch i computes (the axon-tunnel fetch is latency-bound);
    # --speed_test stays synchronous via a forced scalar fetch.
    pending = None
    for bi, batch in enumerate(detection_batches(dataset, batch_size, shuffle=False)):
        n_valid = batch.pop("n_valid")
        tokens = batch.pop("token")
        t0 = time.time()
        preds = predict_step(state, jax.device_put(np.asarray(batch["points"])))
        if speed_test:
            force_completion(preds)
            if start_idx <= bi < 2 * start_idx:
                times.append((time.time() - t0) / batch_size)
        if pending is not None:
            detections.update(predictions_to_host(*pending))
        pending = (preds, tokens[:n_valid])
    if pending is not None:
        detections.update(predictions_to_host(*pending))
    if speed_test and times:
        logger.info(f"Total time per frame: {np.mean(times):.4f}s (middle third)")
    return detections
