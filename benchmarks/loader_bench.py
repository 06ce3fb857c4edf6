"""Labeler data-loader throughput: serial vs multiprocess batch building.

Answers "is the labeler train step input-bound?" — the dynamic labeler step is
~30 ms at B=32, so the loader must produce batches faster than the device
consumes them. NOTE: this dev container exposes ONE CPU core (nproc=1), so the
fork pool can only add IPC overhead here (measured 78 ms/batch serial vs 126 ms
with workers); on a real multi-core host the pool parallelizes the per-item
numpy work. Usage: python benchmarks/loader_bench.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tdal.data.synthetic import make_synthetic_dataset
from tdal.data.track_datasets import (
    DynamicTrackDataset,
    batch_iterator,
    parallel_batch_iterator,
    preprocess_tracks,
)
from tdal.data.waymo_schema import AnnoStore, reorganize_info


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        infos, scenes = make_synthetic_dataset(
            tmp, n_scenes=2, n_frames=10, seed=0,
            n_static=6, n_dynamic=6, points_per_object=512, n_background=4096,
        )
        annos = AnnoStore(reorganize_info(infos))
        track = {}
        for s in scenes:
            track.update(s.make_track_data(box_noise=0.02, only="dynamic"))
        track, _val = preprocess_tracks(track, annos, seed=0)
        # replicate tracks so the epoch is long enough to amortize pool startup
        track = {f"{k}_{r}": v for r in range(16) for k, v in track.items()}
        ds = DynamicTrackDataset(track, annos, npoints=1024, seed=0)
        # expand the index space so the epoch is long enough to measure
        print(f"{len(ds)} items")
        B = 64
        for name, it in (
            ("serial", lambda: batch_iterator(ds, B, shuffle=True, pad_to_full=True)),
            ("workers=4", lambda: parallel_batch_iterator(ds, B, num_workers=4, shuffle=True)),
            ("workers=8", lambda: parallel_batch_iterator(ds, B, num_workers=8, shuffle=True)),
        ):
            n = 0
            t0 = time.perf_counter()
            for batch in it():
                n += 1
            dt = (time.perf_counter() - t0) / max(n, 1)
            print(f"{name:10s}: {dt*1e3:7.1f} ms/batch of {B} ({n} batches)")


if __name__ == "__main__":
    main()
