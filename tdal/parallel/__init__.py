"""Distributed layer: jax.sharding Mesh utilities (replaces torch.distributed/NCCL)."""
