"""End-to-end detector learning validation on fabricated scenes (real TPU).

Trains the tiny PointPillars config from scratch on synthetic sequences and scores it
with the in-framework AP/APH evaluator. Converges visibly (centers + dims match GT;
AP rises with epochs) — the qualitative check that the full detection stack (data ->
targets -> train step -> decode -> NMS -> eval) learns, without Waymo data.

Run: python benchmarks/train_synthetic_ap.py   (takes ~5 min incl. compiles)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax, time, numpy as np, jax.numpy as jnp, optax, pickle, tempfile
from pathlib import Path
print(jax.devices(), flush=True)
root = Path(tempfile.mkdtemp())
from tdal.data.synthetic import make_synthetic_dataset
infos, scenes = make_synthetic_dataset(root, n_scenes=4, n_frames=16, seed=1,
                                       n_static=3, n_dynamic=2, points_per_object=200, n_background=1500)
from tdal.runtime.config import Config
cfg = Config.fromfile("configs/synthetic/pp_tiny.py")
from tdal.models.builder import build_voxel_config, build_detector, build_assigner, build_test_cfg
voxel_cfg = build_voxel_config(cfg.voxel_generator, train=True)
det = build_detector(cfg.model, voxel_cfg)
assigner = build_assigner(cfg.train_cfg["assigner"], det)
test_cfg = build_test_cfg(cfg.test_cfg, det, voxel_cfg)
from tdal.data.detection import DetectionDataset
train_ds = DetectionDataset(infos, class_names=cfg.data["train"]["class_names"], assigner=assigner,
                            voxel_cfg=voxel_cfg, mode="train", max_points=4096)
val_ds = DetectionDataset(infos, class_names=cfg.data["train"]["class_names"], assigner=assigner,
                          voxel_cfg=voxel_cfg, mode="val", max_points=4096, shuffle_points=False)
from tdal.runtime.train_state import TrainState, init_model
from tdal.runtime.schedules import one_cycle, adam_with_schedule
from tdal.pipeline.detector_engine import make_detector_steps
from tdal.pipeline.detector_run import detection_batches, run_inference
import logging
logger = logging.getLogger("e2e"); logging.basicConfig(level=logging.INFO)
B = 8
epochs = 80
steps_per_epoch = max(1, len(train_ds)//B)
lr, mom = one_cycle(1e-3, steps_per_epoch*epochs)
tx = adam_with_schedule(lr, weight_decay=0.01, grad_clip=35.0, momentum_schedule=mom)
ex = train_ds[0]
pts0 = jnp.asarray(np.stack([ex["points"]]*B))
key = jax.random.PRNGKey(0)
params, bs = init_model(det, {"params": key}, pts0)
state = TrainState.create(params, tx, bs)
train_step, _ = make_detector_steps(det, test_cfg, cfg.model["bbox_head"]["code_weights"], donate=False)
t0=time.time()
print("starting training", flush=True)
for ep in range(epochs):
    for batch in detection_batches(train_ds, B, shuffle=True, seed=ep):
        for k in ("n_valid","token","gt_boxes_and_cls"): batch.pop(k, None)
        batch = {k: ([jnp.asarray(x) for x in v] if isinstance(v,list) else jnp.asarray(v)) for k,v in batch.items()}
        state, logs = train_step(state, batch)
    if (ep+1) % 20 == 0:
        print(f"epoch {ep+1}: loss={float(logs['loss']):.3f} hm={float(logs['hm_loss_task0']):.3f}", flush=True)
print(f"trained {epochs} epochs in {time.time()-t0:.0f}s", flush=True)
print("compiling predict...", flush=True)
from tdal.pipeline.detector_engine import make_detector_steps, predictions_to_host
_, predict_step = make_detector_steps(det, test_cfg, cfg.model["bbox_head"]["code_weights"], donate=False)
detections = {}
for bi, batch in enumerate(detection_batches(val_ds, B, shuffle=False, prefetch=False)):
    n_valid = batch.pop("n_valid"); tokens = batch.pop("token")
    preds = predict_step(state, jnp.asarray(batch["points"]))
    preds = {k: np.asarray(v) for k, v in preds.items()}
    print(f"batch {bi} done", flush=True)
    detections.update(predictions_to_host(preds, tokens[:n_valid]))
from tdal.utils.detection_metrics import evaluate_detection, gt_from_annos, detections_to_eval_format
from tdal.data.waymo_schema import reorganize_info
gts = gt_from_annos(reorganize_info(infos))
for thr in (0.7, 0.5, 0.3):
    m = evaluate_detection(detections_to_eval_format(detections), gts,
                           iou_thresholds={"VEHICLE": thr})
    print(f"IoU@{thr}:", {k: round(v,3) for k,v in m.items()}, flush=True)

# debug: top detections vs GT on frame 0
from tdal.utils.detection_metrics import detections_to_eval_format, gt_from_annos
from tdal.data.waymo_schema import reorganize_info
dets = detections_to_eval_format(detections)
gts = gt_from_annos(reorganize_info(infos))
tok = list(dets)[0]
d = dets[tok]; g = gts[tok]
order = np.argsort(-d["scores"])[:6]
print("top det boxes:", np.round(d["boxes"][order], 2), flush=True)
print("det scores:", np.round(d["scores"][order], 3), flush=True)
print("gt boxes:", np.round(g["boxes"], 2), flush=True)
