"""Process-management helpers shared by the fork-pool code paths.

A fork() AFTER the JAX runtime has initialized (PJRT threads live) can wedge
the child — Python itself warns "os.fork() incompatible with multithreaded
code". tdal's fork pools (tdal/pipeline/shard.py, track_datasets
.parallel_batch_iterator) therefore check fork_safe() and degrade to the
sequential path with a warning instead of forking a multithreaded parent.
(ADVICE r2: fork workers before JAX initialization, or don't fork.)
"""

from __future__ import annotations

import sys
import warnings


def jax_initialized() -> bool:
    """True if the JAX runtime has live backends in this process (without
    triggering initialization ourselves)."""
    jax = sys.modules.get("jax")
    if jax is None:
        return False
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        # Private-API drift: assume initialized (the conservative answer —
        # "don't fork" is always safe, forking a threaded parent is not).
        return True


def fork_safe(what: str) -> bool:
    """True if fork-based worker pools are safe here; warns and returns False
    once the JAX runtime is up (callers fall back to sequential/in-process)."""
    if not jax_initialized():
        return True
    warnings.warn(
        f"{what}: JAX is already initialized in this process; fork-based "
        "workers can deadlock on the runtime's threads. Falling back to the "
        "sequential path — start worker pools BEFORE touching JAX (or run "
        "the stage in a separate launcher process) to parallelize.",
        RuntimeWarning,
        stacklevel=3,
    )
    return False
