"""FLOPs / cost accounting via XLA's compiled cost analysis.

Capability parity with reference ``det3d/utils/flops_counter.py:59-445`` (hook-based
per-module FLOPs accounting). On TPU the compiler already knows: we lower + compile
the jitted function and read XLA's cost analysis, which counts post-fusion flops and
bytes — strictly more accurate than module-hook estimates.
"""

from __future__ import annotations

import jax


def cost_analysis(fn, *example_args, **example_kwargs):
    """Compile fn on example args and return {'flops', 'bytes_accessed', ...}."""
    compiled = jax.jit(fn).lower(*example_args, **example_kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-computation list
        costs = costs[0]
    return dict(costs or {})


def flops(fn, *example_args, **example_kwargs) -> float:
    return float(cost_analysis(fn, *example_args, **example_kwargs).get("flops", 0.0))


def format_cost(costs: dict) -> str:
    f = costs.get("flops", 0.0)
    b = costs.get("bytes accessed", costs.get("bytes_accessed", 0.0))
    return f"{f / 1e9:.2f} GFLOPs, {b / 1e6:.1f} MB accessed"
