"""Per-sequence sharding of the offboard pipeline (SURVEY §2.8 scale axis).

The 3DAL pipeline's heavy stages — detect, track, trackData extraction, labeler
inference — are embarrassingly parallel over driving SEQUENCES (tracking state
never crosses a sequence boundary; reference waymo_tracking/test.py:88-134
resets the tracker at frame 0). This module partitions a frame-info map into
balanced per-sequence shards and runs a stage callable over them, either
in-process (devices of one host sharing the chip) or across worker processes
(one per host / per CPU for host-bound stages).

Replaces the reference's manual "run the CLI 16 times with --split i" pattern
(trackData sharding, waymo_common.py:208-218) with an in-framework fan-out.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Sequence


def sequence_of(token: str) -> int:
    """Sequence id parsed from a frame token ('seq_<k>_frame_<j>.pkl')."""
    return int(token.split("_")[1])


def partition_by_sequence(info_map: Dict[str, dict], n_shards: int) -> List[Dict[str, dict]]:
    """Split a token->info map into n_shards maps, whole sequences only,
    greedily balanced by frame count (largest-first bin packing)."""
    seqs: Dict[int, list] = {}
    for token in info_map:
        seqs.setdefault(sequence_of(token), []).append(token)
    loads = [0] * n_shards
    shards: List[Dict[str, dict]] = [dict() for _ in range(n_shards)]
    for seq_id, tokens in sorted(seqs.items(), key=lambda kv: -len(kv[1])):
        tgt = loads.index(min(loads))
        loads[tgt] += len(tokens)
        for t in tokens:
            shards[tgt][t] = info_map[t]
    return shards


def shard_detections(detections: Dict[str, dict], shard_infos: Dict[str, dict]) -> Dict[str, dict]:
    """Restrict a detections map to one shard's tokens."""
    return {t: detections[t] for t in shard_infos if t in detections}


_STAGE_FN = None  # set before fork; workers inherit copy-on-write


def _run_stage(args):
    shard_id, shard = args
    return shard_id, _STAGE_FN(shard_id, shard)


def run_sharded(
    stage_fn: Callable[[int, Dict[str, dict]], object],
    info_map: Dict[str, dict],
    n_shards: int = None,
    processes: bool = False,
) -> List[object]:
    """Run stage_fn(shard_id, shard_info_map) over per-sequence shards.

    processes=False: sequential in this process (the device serializes anyway
    on a single chip — sharding still bounds memory and enables resume).
    processes=True: a fork pool, one worker per shard (host-bound stages, or
    one-process-per-host launches). Results return in shard order."""
    from tdal.utils.procutils import fork_safe

    n_shards = n_shards or (os.cpu_count() or 8)
    shards = partition_by_sequence(info_map, n_shards)
    jobs = [(i, s) for i, s in enumerate(shards) if s]
    if processes and not fork_safe("run_sharded"):
        processes = False
    if not processes:
        return [stage_fn(i, s) for i, s in jobs]
    import multiprocessing as mp

    global _STAGE_FN
    _STAGE_FN = stage_fn
    ctx = mp.get_context("fork")
    pool = ctx.Pool(len(jobs))
    try:
        results = dict(pool.imap_unordered(_run_stage, jobs))
    finally:
        pool.terminate()
        pool.join()
        _STAGE_FN = None
    return [results[i] for i, _ in jobs]


def merge_dicts(results: Sequence[Dict]) -> Dict:
    """Merge per-shard dict outputs (e.g. detections or trackData maps)."""
    out: Dict = {}
    for r in results:
        out.update(r)
    return out


def run_sharded_resumable(
    stage_fn: Callable[[int, Dict[str, dict]], object],
    info_map: Dict[str, dict],
    out_dir,
    n_shards: int = 16,
    processes: bool = False,
) -> List[object]:
    """run_sharded with per-shard checkpointing: a 200k-frame array job that
    dies mid-way resumes by skipping every shard whose output pickle exists.

    Each shard's result is written to out_dir/shard_{i:04d}.pkl atomically
    (tmp + rename); a restart recomputes only the missing shards. The failure
    model the reference handled by hand-rerunning `--split i` CLI invocations
    (SURVEY §5.3)."""
    import pickle
    from pathlib import Path

    from tdal.utils.procutils import fork_safe

    if processes and not fork_safe("run_sharded_resumable"):
        processes = False
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    shards = partition_by_sequence(info_map, n_shards)

    def shard_path(i):
        return out_dir / f"shard_{i:04d}.pkl"

    def run_one(i, shard):
        p = shard_path(i)
        if p.exists():
            with open(p, "rb") as f:
                return pickle.load(f)
        result = stage_fn(i, shard)
        tmp = p.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(result, f)
        tmp.rename(p)
        return result

    jobs = [(i, s) for i, s in enumerate(shards) if s]
    if not processes:
        return [run_one(i, s) for i, s in jobs]
    import multiprocessing as mp

    todo = [(i, s) for i, s in jobs if not shard_path(i).exists()]
    if todo:
        global _STAGE_FN
        _STAGE_FN = lambda i, s: run_one(i, s)
        ctx = mp.get_context("fork")
        pool = ctx.Pool(len(todo))
        try:
            list(pool.imap_unordered(_run_stage, todo))
        finally:
            pool.terminate()
            pool.join()
            _STAGE_FN = None
    out = []
    for i, _ in jobs:
        with open(shard_path(i), "rb") as f:
            out.append(pickle.load(f))
    return out
