"""Per-sequence pipeline sharding + multiprocess batch loading."""

import numpy as np

from tdal.pipeline.shard import (
    merge_dicts,
    partition_by_sequence,
    run_sharded,
    sequence_of,
)


def _fake_info_map():
    info_map = {}
    for seq, n in ((0, 10), (1, 4), (2, 7), (3, 1)):
        for f in range(n):
            tok = f"seq_{seq}_frame_{f}.pkl"
            info_map[tok] = {"timestamp": float(f)}
    return info_map


def test_partition_whole_sequences_balanced():
    info_map = _fake_info_map()
    shards = partition_by_sequence(info_map, 2)
    assert sum(len(s) for s in shards) == len(info_map)
    # whole sequences: every sequence lands in exactly one shard
    for seq in range(4):
        holders = [i for i, s in enumerate(shards)
                   if any(sequence_of(t) == seq for t in s)]
        assert len(holders) == 1
    # greedy balance: 22 frames -> no shard takes more than 12
    assert max(len(s) for s in shards) <= 12


def test_run_sharded_inprocess_and_processes():
    info_map = _fake_info_map()

    def stage(shard_id, shard):
        return {t: sequence_of(t) for t in shard}

    seq_results = run_sharded(stage, info_map, n_shards=3)
    merged = merge_dicts(seq_results)
    assert set(merged) == set(info_map)

    par_results = run_sharded(stage, info_map, n_shards=3, processes=True)
    assert merge_dicts(par_results) == merged


def test_parallel_batch_iterator_matches_serial():
    from tdal.data.track_datasets import batch_iterator, parallel_batch_iterator

    class DS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"x": np.full((3,), float(i)), "token": f"t{i}"}

    ds = DS()
    serial = list(batch_iterator(ds, 4, shuffle=True, seed=3, pad_to_full=True))
    par = list(parallel_batch_iterator(ds, 4, num_workers=2, shuffle=True, seed=3))
    assert len(par) == len(serial)
    for a, b in zip(serial, par):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert a["token"] == b["token"]
        assert a["n_valid"] == b["n_valid"]


def test_run_sharded_resumable(tmp_path):
    """A crashed array job resumes by skipping completed shards."""
    from tdal.pipeline.shard import run_sharded_resumable

    info_map = _fake_info_map()
    calls = []

    def stage(shard_id, shard):
        calls.append(shard_id)
        return {t: sequence_of(t) for t in shard}

    out = tmp_path / "stage"
    first = run_sharded_resumable(stage, info_map, out, n_shards=3)
    n_first = len(calls)
    assert n_first >= 2
    # "crash": delete ONE shard's output; resume recomputes only that shard
    victims = sorted(out.glob("shard_*.pkl"))
    victims[0].unlink()
    calls.clear()
    second = run_sharded_resumable(stage, info_map, out, n_shards=3)
    assert len(calls) == 1
    assert merge_dicts(second) == merge_dicts(first)
    # fully-complete run touches nothing
    calls.clear()
    third = run_sharded_resumable(stage, info_map, out, n_shards=3, processes=True)
    assert calls == [] and merge_dicts(third) == merge_dicts(first)
