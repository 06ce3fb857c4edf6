"""Honest device timing through the axon PJRT tunnel.

``block_until_ready`` can return BEFORE execution finishes on this stack (a
137-GFLOP matmul "completed" in 0.03 ms when timed that way), so every timed
region must (a) chain iterations through a data dependency so they serialize and
(b) end with a host transfer of a scalar, which cannot complete until the device
buffer exists. ``bench.py``, ``benchmarks/micro.py`` and the ``--speed_test``
path of ``tools/dist_test.py`` all time through these helpers.

Capability parity: reference ``tools/dist_test.py:148-186`` (middle-third
per-frame timing) relied on ``torch.cuda.synchronize``; this is the TPU/axon
equivalent of that sync.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def force_completion(tree) -> float:
    """Force execution of everything feeding `tree` via a one-scalar host fetch.

    Returns the fetched scalar (useful as a data-dependency carry)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def chain(carry, tree):
    """Fold a zero-valued data dependency on `tree` into `carry` (an array),
    so the next use of `carry` cannot start before `tree` is computed."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    dep = jnp.sum(leaf).astype(carry.dtype) * 0
    return carry + dep


def timeit_chained(fn, carry, *rest, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds/iteration of `fn(carry, *rest) -> new_carry`.

    `fn` MUST thread its result back through `carry` (use `chain`) so the timed
    iterations form one dependency chain on device."""
    for _ in range(warmup):
        carry = fn(carry, *rest)
    force_completion(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry, *rest)
    force_completion(carry)
    return (time.perf_counter() - t0) / iters


def timeit_chained_stats(
    fn, carry, *rest, iters: int = 10, warmup: int = 2, repeats: int = 5
) -> dict:
    """Repeat ``timeit_chained`` ``repeats`` times and report dispersion.

    The axon tunnel's latency varies hour-to-hour and the round-2 headline
    metric swung 2.7x between rounds on unchanged code (VERDICT r2 item 5);
    a median over independent chained blocks with min/max attached makes
    round-over-round deltas interpretable. Returns seconds/iteration stats
    {"median", "min", "max", "mean", "repeats"}."""
    samples = []
    for r in range(repeats):
        samples.append(
            timeit_chained(fn, carry, *rest, iters=iters, warmup=warmup if r == 0 else 1)
        )
    samples.sort()
    n = len(samples)
    median = samples[n // 2] if n % 2 else 0.5 * (samples[n // 2 - 1] + samples[n // 2])
    return {
        "median": median,
        "min": samples[0],
        "max": samples[-1],
        "mean": sum(samples) / n,
        "repeats": n,
    }


def stats_timer(measure_once, repeats: int = 5) -> dict:
    """Dispersion stats for an arbitrary zero-arg measurement returning
    seconds (or any scalar): median/min/max/mean over ``repeats`` calls.
    For measurements that can't be expressed as a chained-carry fn."""
    samples = sorted(float(measure_once()) for _ in range(repeats))
    n = len(samples)
    median = samples[n // 2] if n % 2 else 0.5 * (samples[n // 2 - 1] + samples[n // 2])
    return {
        "median": median,
        "min": samples[0],
        "max": samples[-1],
        "mean": sum(samples) / n,
        "repeats": n,
    }
