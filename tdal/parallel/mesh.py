"""Device-mesh setup and batch sharding: the TPU-native distributed layer.

Replaces the reference's entire torch.distributed/NCCL stack (SURVEY.md §2.8/§5.8:
tools/train.py:84-88, torchie/apis/env.py:13-48, DDP wrap apis/train.py:284-291,
pickle all_gather torchie/trainer/utils.py:114-155) with a single
``jax.sharding.Mesh`` + NamedSharding batch sharding:

- gradient allreduce is implicit in the jit'd, sharded update (XLA inserts psum over
  ICI; DCN handled by the same collectives across slices),
- apex syncBN becomes BatchNorm(axis_name=...) stat pmean,
- eval all_gather becomes jax.experimental.multihost_utils.process_allgather,
- SLURM/MPI launchers become jax.distributed.initialize.

The reference's only parallelism is data parallelism (SURVEY.md §2.8); the mesh is
therefore one ``data`` axis, but utilities take arbitrary axis layouts so a ``model``
axis can be added for larger variants.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host init. Replaces reference init_dist pytorch/slurm/mpi launchers
    (torchie/apis/env.py:13-48). No-op on single host."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(axis_names: Sequence[str] = (DATA_AXIS,), axis_sizes: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    Default: 1-D data-parallel mesh over every addressable device."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


SPATIAL_AXIS = "spatial"


def spatial_sharding(
    mesh: Mesh, batch_axis: Optional[str] = None, spatial_axis: str = SPATIAL_AXIS
) -> NamedSharding:
    """Sharding for an NHWC BEV canvas: H split over ``spatial_axis`` (and
    optionally N over ``batch_axis``).

    Passed to a detector's ``bev_sharding`` field, this spatially partitions
    the dense BEV stack (RPN + heads) across the mesh: XLA's SPMD partitioner
    splits every conv's spatial dim and inserts the 1-pixel halo exchanges
    (collective-permute over ICI) itself — the scaling-book recipe, no manual
    halos. This is how a SINGLE frame scales past one chip (latency scaling
    for serving the production VoxelNet config), something the reference's
    data-parallel-only design cannot express (SURVEY.md §2.8)."""
    return NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a host batch pytree with the batch dim sharded over ``axis``.

    Batch dims must be divisible by the axis size — pad on the host first
    (cf. reference DistributedSampler padding, datasets/loader/sampler.py:112-222)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad (by repeating the last element) so shape[axis] % multiple == 0.

    Returns (padded, n_valid). The repeat-pad mirrors the reference sampler's
    index-repetition padding (datasets/loader/sampler.py:146-155)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_idx = np.full(rem, n - 1, dtype=np.int64)
    pad = np.take(arr, pad_idx, axis=axis)
    return np.concatenate([arr, pad], axis=axis), n


def process_allgather(tree):
    """Gather a host-local pytree across processes (eval-result merging).

    Replaces the reference's pickle-tensor all_gather (torchie/trainer/utils.py:114-155).
    Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
