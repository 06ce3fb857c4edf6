"""Detector training / inference drivers (used by tools/train.py, tools/dist_test.py).

The functional replacement for the reference's torchie Trainer + train_detector flow
(torchie/apis/train.py:252-327, trainer.py:130-595): epoch loop over the host data
pipeline, one jit'd step, OneCycle'd AdamW, periodic checkpoints, windowed metric
logging, mesh-sharded batches.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from tdal.data.detection import collate_detection
from tdal.data.track_datasets import Prefetcher
from tdal.pipeline.detector_engine import make_detector_steps, predictions_to_host
from tdal.runtime.checkpoint import CheckpointManager
from tdal.runtime.logging_utils import LogBuffer, MetricsWriter
from tdal.runtime.train_state import TrainState
from tdal.utils.timing import force_completion


def detection_batches(dataset, batch_size, shuffle=False, seed=0, pad_to_full=True, prefetch=True):
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)

    def gen():
        for start in range(0, n, batch_size):
            sel = idx[start : start + batch_size]
            if len(sel) < batch_size:
                if pad_to_full:
                    sel = np.concatenate(
                        [sel, np.full(batch_size - len(sel), sel[-1])]
                    )
                else:
                    return
            batch = collate_detection([dataset[int(i)] for i in sel])
            batch["n_valid"] = min(batch_size, n - start)
            yield batch

    return Prefetcher(gen()) if prefetch else gen()


def evaluate_detector(
    detector, state, val_ds, test_cfg, code_weights, batch_size, logger,
    max_frames=None,
):
    """Inference over a val split + in-framework AP/APH.

    The TPU-native stand-in for the reference's in-training val epoch
    (torchie/trainer/trainer.py:424-480, which gathers results across ranks and
    defers scoring); here quality is scored directly (detection_metrics)."""
    from tdal.data.waymo_schema import reorganize_info
    from tdal.utils.detection_metrics import (
        detections_to_eval_format,
        evaluate_detection,
        gt_from_annos,
    )

    import copy

    if max_frames is not None and len(val_ds.infos) > max_frames:
        val_ds = copy.copy(val_ds)
        val_ds.infos = val_ds.infos[:max_frames]
    detections = run_inference(
        detector, state, val_ds, test_cfg, code_weights, batch_size, logger
    )
    info_map = val_ds.infos
    if not isinstance(info_map, dict):
        info_map = reorganize_info(info_map)
    gts = gt_from_annos(info_map)
    return evaluate_detection(detections_to_eval_format(detections), gts)


def train_detector(
    detector,
    state: TrainState,
    train_ds,
    test_cfg: dict,
    code_weights,
    n_epoch: int,
    batch_size: int,
    logger,
    work_dir,
    weight: float = 2.0,
    mesh=None,
    log_every: int = 10,
    seed: int = 0,
    val_ds=None,
    val_every: int = 1,
    val_max_frames: int = None,
    profile_dir=None,
):
    from tdal.parallel.mesh import shard_batch

    train_step, _ = make_detector_steps(detector, test_cfg, code_weights, weight)
    mgr = CheckpointManager(Path(work_dir) / "checkpoints")
    writer = MetricsWriter(Path(work_dir) / "logs")
    buf = LogBuffer()
    steps_per_epoch = max(1, len(train_ds) // batch_size)

    for epoch in range(n_epoch):
        t0 = time.time()
        for i, batch in enumerate(
            detection_batches(train_ds, batch_size, shuffle=True, seed=seed + epoch)
        ):
            batch.pop("n_valid", None)
            batch.pop("token", None)
            batch.pop("gt_boxes_and_cls", None)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            # steady-state trace capture (reference: torchie IterTimerHook +
            # nvprof workflows; here jax.profiler xplane/perfetto output)
            prof_start = min(5, max(steps_per_epoch - 2, 0))
            prof_stop = min(prof_start + 4, steps_per_epoch - 1)
            if profile_dir is not None and epoch == 0 and i == prof_start:
                jax.profiler.start_trace(str(profile_dir))
            state, logs = train_step(state, batch)
            if profile_dir is not None and epoch == 0 and i == prof_stop:
                force_completion(state.params)
                jax.profiler.stop_trace()
                logger.info(
                    f"profiler trace (steps {prof_start}-{prof_stop}) -> {profile_dir}"
                )
                profile_dir = None
            buf.update({k: float(v) for k, v in logs.items()})
            if (i + 1) % log_every == 0:
                buf.average(log_every)
                msg = ", ".join(f"{k}: {v:.4f}" for k, v in buf.output.items())
                logger.info(
                    f"Epoch [{epoch + 1}/{n_epoch}][{i + 1}/{steps_per_epoch}] {msg}"
                )
                writer.write(int(state.step), buf.output)
                buf.clear_output()
        logger.info(f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s")
        mgr.save(
            int(state.step),
            {"params": state.params, "batch_stats": state.batch_stats},
            meta={"epoch": epoch + 1},
        )
        # In-training validation (reference Trainer val workflow,
        # torchie/trainer/trainer.py:424-480) scored with the in-framework AP/APH.
        if val_ds is not None and (epoch + 1) % val_every == 0:
            metrics = evaluate_detector(
                detector, state, val_ds, test_cfg, code_weights, batch_size,
                logger, max_frames=val_max_frames,
            )
            msg = ", ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
            logger.info(f"Val epoch {epoch + 1}: {msg}")
            writer.write(int(state.step), {f"val/{k}": v for k, v in metrics.items()})
    return state


def run_inference(
    detector,
    state: TrainState,
    dataset,
    test_cfg: dict,
    code_weights,
    batch_size: int,
    logger,
    speed_test: bool = False,
    double_flip: bool = False,
    profile_dir=None,
):
    """Inference over a dataset -> {token: {box3d_lidar, scores, label_preds}}.

    Parity: tools/dist_test.py:139-209 incl. the middle-third speed measurement;
    double_flip runs the 4-variant TTA path (test_cfg double_flip semantics)."""
    if double_flip:
        from tdal.pipeline.detector_engine import make_tta_predict_step

        predict_step = make_tta_predict_step(detector, test_cfg)
    else:
        _, predict_step = make_detector_steps(
            detector, test_cfg, code_weights, donate=False
        )
    detections = {}
    n_batches = (len(dataset) + batch_size - 1) // batch_size
    start_idx, times = n_batches // 3, []
    # Software pipeline: upload + enqueue batch i, THEN fetch batch i-1's
    # outputs — the device computes batch i while the (latency-bound, ~100 ms
    # through the axon tunnel) host fetch of batch i-1 is in flight. In
    # --speed_test mode the loop stays fully synchronous so per-frame numbers
    # remain honest chained timings (see tdal.utils.timing).
    pending = None  # (preds, tokens) of the previous batch
    for bi, batch in enumerate(
        detection_batches(dataset, batch_size, shuffle=False)
    ):
        n_valid = batch.pop("n_valid")
        tokens = batch.pop("token")
        points = np.asarray(batch["points"])
        if double_flip:
            from tdal.models.tta import double_flip_points

            variants = [double_flip_points(p) for p in points]
            points = np.stack([v for vs in variants for v in vs])  # (B*4, N, D)
        profile_stop = min(start_idx + 2, n_batches - 1)
        if profile_dir is not None and bi == start_idx:
            jax.profiler.start_trace(str(profile_dir))
        # Time with a forced one-scalar host fetch: block_until_ready can return
        # before execution finishes through the axon PJRT tunnel (CLAUDE.md /
        # benchmarks/RESULTS.md), which made the reference-style timing
        # (dist_test.py:148-186, torch.cuda.synchronize) read near-zero here.
        t0 = time.time()
        preds = predict_step(state, jax.device_put(points))
        if speed_test:
            force_completion(preds)
            dt = time.time() - t0
            if bi >= start_idx and bi < 2 * start_idx:
                times.append(dt / batch_size)
        if pending is not None:
            detections.update(predictions_to_host(*pending))
        pending = (preds, tokens[:n_valid])
        if profile_dir is not None and bi == profile_stop:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace (middle batches) -> {profile_dir}")
            profile_dir = None
        if (bi + 1) % 20 == 0:
            logger.info(f"inference {bi + 1}/{n_batches}")
    if pending is not None:
        detections.update(predictions_to_host(*pending))
    if speed_test and times:
        logger.info(f"Total time per frame: {np.mean(times):.4f}s (middle third)")
    return detections
