"""Device mesh + sharding helpers for data-parallel training.

The reference has no distributed layer at all (SURVEY.md §2.10: no
torch.distributed / NCCL anywhere); large batches are emulated on one
GPU. Here data parallelism is native: a 1-D 'data' mesh, batch tensors
sharded on axis 0, parameters replicated. The metric losses consume the
full (B, B) affinity matrix, so XLA inserts the embedding all-gather
over ICI automatically — global batch-hard mining across the whole
slice comes for free from the sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    # Auto axis type: let XLA propagate shardings (jax>=0.7 defaults to
    # Explicit, which rejects sharding-changing reshapes in our
    # microbatch split).
    return jax.make_mesh((len(devices),), (DATA_AXIS,), devices=devices,
                         axis_types=(jax.sharding.AxisType.Auto,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a host pytree with the batch axis sharded.

    Leaves whose leading dim is not divisible by the mesh size (tiny
    debug batches, last ragged minibatch) fall back to replication —
    XLA still computes them correctly, just without DP savings.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.size == 0
        return jax.device_put(x, sh if ok else rep)

    return jax.tree_util.tree_map(put, tree)


def make_global_batch(mesh: Mesh, host_tree):
    """Assemble a global batch from per-host shards on a multi-host
    slice; single-process falls back to :func:`shard_batch`.

    Each host feeds its own shard of the global batch (its slice of
    samples AND the matching rows of the (B, B) positive/negative
    masks); `jax.make_array_from_process_local_data` stitches them into
    one global jax.Array sharded over the data axis, so the loss's
    embedding all-gather rides ICI (SURVEY.md §2.10).
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, host_tree)
    sh = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, host_tree)
