"""Headline benchmark: static Frustum-PointNet labeler forward throughput.

BASELINE.json primary config: "static_model.py Frustum-PointNet forward: batch of 32
padded 512-pt object sets, CPU" with a rebuild target of >=10x reference CPU throughput
(BASELINE.md). The reference publishes no numbers, so the baseline is measured here: an
architecture-identical torch CPU model (same layer widths as reference
tools/static_model.py:241-339) timed in-process, compared against the tdal JAX model on
the default JAX device (the TPU under axon; CPU elsewhere).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

B, N, NOBJ = 32, 512, 512
WARMUP, ITERS = 3, 20


def measure_torch_cpu_baseline() -> float:
    """Reference-equivalent torch CPU forward, sets/sec."""
    import torch
    import torch.nn as nn

    class SegNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, 64), (64, 64), (64, 64), (64, 128), (128, 1024)]
            self.enc = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in chans]
            )
            dchans = [(1088, 512), (512, 256), (256, 128), (128, 128)]
            self.dec = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in dchans]
            )
            self.head = nn.Conv1d(128, 2, 1)

        def forward(self, x):
            skips = []
            for i, m in enumerate(self.enc):
                x = m(x)
                if i == 1:
                    skips.append(x)
            g = torch.max(x, 2, keepdim=True)[0].repeat(1, 1, x.shape[2])
            x = torch.cat([skips[0], g], 1)
            for m in self.dec:
                x = m(x)
            return self.head(x).transpose(2, 1)

    class BoxNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(3, 128), (128, 128), (128, 256), (256, 512)]
            self.enc = nn.ModuleList(
                [nn.Sequential(nn.Conv1d(i, o, 1), nn.BatchNorm1d(o), nn.ReLU()) for i, o in chans]
            )
            self.fc = nn.Sequential(
                nn.Linear(512, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Linear(256, 59),
            )

        def forward(self, x):
            for m in self.enc:
                x = m(x)
            return self.fc(torch.max(x, 2)[0])

    torch.manual_seed(0)
    seg, box = SegNet().eval(), BoxNet().eval()
    pts = torch.randn(B, 3, N)
    with torch.no_grad():
        for _ in range(WARMUP):
            logits = seg(pts)
            _ = box(pts)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            logits = seg(pts)
            _ = box(pts)
        dt = (time.perf_counter() - t0) / ITERS
    return B / dt


def measure_tdal() -> float:
    """tdal JAX static labeler forward on the default device, sets/sec."""
    import jax
    import jax.numpy as jnp

    from tdal.models import StaticLabelerOneBox
    from tdal.runtime.train_state import init_model

    key = jax.random.PRNGKey(0)
    model = StaticLabelerOneBox(n_object_points=NOBJ)
    pts = jax.random.normal(key, (B, N, 3))
    init_box = jnp.tile(jnp.array([0.0, 0.0, 0.0, 4.8, 1.8, 1.5, 0.0]), (B, 1))
    params, bs = init_model(
        model, {"params": key, "gather": key, "dropout": key}, pts, init_box
    )
    variables = {"params": params, "batch_stats": bs}

    @jax.jit
    def fwd(pts, init_box):
        return model.apply(variables, pts, init_box, train=False)["center"]

    # Chain iterations through a data dependency and fetch a scalar at the end:
    # block_until_ready is unreliable through the axon PJRT tunnel (returns before
    # execution), so independent timed calls under-measure. The chained sum forces
    # sequential execution; the final float() forces completion.
    p = pts
    for _ in range(WARMUP):
        out = fwd(p, init_box)
        p = p + out.sum() * 0.0
    _ = float(out.sum())
    t0 = time.perf_counter()
    p = pts
    for _ in range(ITERS):
        out = fwd(p, init_box)
        p = p + out.sum() * 0.0
    _ = float(out.sum())
    dt = (time.perf_counter() - t0) / ITERS
    return B / dt


def main():
    baseline = measure_torch_cpu_baseline()
    value = measure_tdal()
    print(
        json.dumps(
            {
                "metric": "static_labeler_forward_sets_per_sec_b32_n512",
                "value": round(value, 1),
                "unit": "object point-sets/sec",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
