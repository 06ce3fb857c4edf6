import jax, time, numpy as np, jax.numpy as jnp
from tdal.models.center_head import decode_preds, post_process_task
H, W, C = 468, 468, 3
key = jax.random.PRNGKey(0)
def mk(shift):
    return {
      "hm": jax.random.normal(key, (1, H, W, C)) + shift,
      "reg": jax.random.normal(key, (1, H, W, 2)) * 0.1,
      "height": jax.random.normal(key, (1, H, W, 1)),
      "dim": jax.random.normal(key, (1, H, W, 3)) * 0.1 + 1.0,
      "rot": jax.random.normal(key, (1, H, W, 2)),
      "vel": jax.random.normal(key, (1, H, W, 2)),
    }
cfg = dict(post_center_limit_range=[-80,-80,-10,80,80,10],
  nms=dict(nms_pre_max_size=4096, nms_post_max_size=500, nms_iou_threshold=0.7),
  score_threshold=0.1, pc_range=[-74.88,-74.88], out_size_factor=1, voxel_size=[0.32,0.32])
dec = jax.jit(lambda p: decode_preds(p, cfg))
pp = jax.jit(lambda b, h: post_process_task(b, h, cfg))
t0 = time.time(); preds = mk(-3.0); boxes, hm = dec(preds)
r = pp(boxes, hm); jax.block_until_ready(r["scores"])
print(f"compile: {time.time()-t0:.1f}s", flush=True)
for shift, name in [(-3.0, "some live"), (-6.0, "few live"), (0.0, "most live")]:
    preds = mk(shift)
    boxes, hm = dec(preds)
    live = int((hm.max(-1) > 0.1).sum())
    r = pp(boxes, hm); jax.block_until_ready(r["scores"])
    ts = []
    for _ in range(3):
        t0=time.time(); r = pp(boxes, hm); jax.block_until_ready(r["scores"]); ts.append(time.time()-t0)
    kept = int(np.asarray(r["valid"]).sum())
    print(f"{name}: live={live} kept={kept} nms={min(ts)*1e3:.1f} ms", flush=True)
