"""Batched, static-shape octree construction in pure JAX.

TPU-first redesign of the reference's octree data structure. The reference
merges per-sample `ocnn` octrees into one ragged node list with dynamic
per-depth node counts (`ocnn.octree.merge_octrees`, consumed at
/root/reference/datasets/dataset_utils.py:74-98 and wrapped by `OctreeT`
at /root/reference/models/octree.py:38-93). Ragged layouts force dynamic
shapes and CPU-side bookkeeping, both of which defeat XLA compilation.

Here every sample owns a fixed-capacity, Morton-sorted node array per
depth with a validity count. Consequences:

* every tensor in the model has a static shape -> one XLA compilation;
* attention windows never straddle two samples, eliminating the
  reference's "leaky window" masking (/root/reference/models/octree.py:124-137);
* the batch axis is embarrassingly shardable for data parallelism.

The whole build is jit-compatible (sort + segment ops), so octrees are
constructed **on device** from raw point clouds inside the training step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from hotformerloc_tpu.octree import morton
from hotformerloc_tpu.octree.morton import SENTINEL


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_capacities(num_points: int, depth: int, min_depth: int,
                       multiple_of: int = 8) -> Tuple[int, ...]:
    """Per-depth node capacity schedule (index 0 == min_depth).

    A depth-d level can never hold more non-empty octants than
    min(P, 8^d), and a child level never has fewer nodes than its parent
    level, so these caps are safe upper bounds. Capacities are rounded up
    to ``multiple_of`` (typically patch_size * dilation) so window
    partitioning needs no extra padding.
    """
    caps = []
    for d in range(min_depth, depth + 1):
        cap = min(num_points, 8**d)
        caps.append(round_up(max(cap, 1), multiple_of))
    return tuple(caps)


@struct.dataclass
class BatchedOctree:
    """Fixed-capacity batched octree.

    Attributes:
      depth: finest (leaf) depth.
      min_depth: coarsest depth materialised.
      caps: static per-depth capacities, index 0 == ``min_depth``.
      keys: per depth, (B, cap_d) int32 Morton keys sorted ascending with
        SENTINEL padding in the tail.
      counts: per depth, (B,) int32 number of valid nodes.
      parents: per depth (except the coarsest), (B, cap_d) int32 index of
        each node's parent in the depth-1 arrays; -1 for padding.
      leaf_mean: (B, cap_leaf, 3) float32 mean point position per leaf
        octant in the original [-1, 1] frame (zero for padding). This is
        the source of the 'P' input feature (ocnn InputFeature('P'),
        consumed at /root/reference/models/hotformerloc.py:28-31).
      leaf_npts: (B, cap_leaf) float32 number of raw points per leaf.
      overflow: (B,) int32 total nodes dropped across all depths because
        a level's true occupancy exceeded its capacity. Zero with the
        default worst-case capacities; with occupancy-tuned capacities
        (tools/measure_occupancy.py) this is surfaced in the train stats
        so silent accuracy loss is impossible.
      leaf_normal: optional (B, cap_leaf, 3) float32 mean point normal
        per leaf octant (zero for padding); present only when the build
        was given per-point normals. Source of the 'N' input feature
        (ocnn InputFeature 'N', /root/reference/models/model_factory.py:9-23).
    """
    depth: int = struct.field(pytree_node=False)
    min_depth: int = struct.field(pytree_node=False)
    caps: Tuple[int, ...] = struct.field(pytree_node=False)
    keys: Tuple[jnp.ndarray, ...]
    counts: Tuple[jnp.ndarray, ...]
    parents: Tuple[Optional[jnp.ndarray], ...]
    leaf_mean: jnp.ndarray
    leaf_npts: jnp.ndarray
    overflow: jnp.ndarray
    leaf_normal: Optional[jnp.ndarray] = None

    # -- indexed accessors (depth-keyed) --------------------------------
    def level(self, d: int) -> int:
        assert self.min_depth <= d <= self.depth, f"depth {d} out of range"
        return d - self.min_depth

    def cap(self, d: int) -> int:
        return self.caps[self.level(d)]

    def key(self, d: int) -> jnp.ndarray:
        return self.keys[self.level(d)]

    def count(self, d: int) -> jnp.ndarray:
        return self.counts[self.level(d)]

    def parent(self, d: int) -> jnp.ndarray:
        p = self.parents[self.level(d)]
        assert p is not None, f"no parent map at depth {d}"
        return p

    def node_valid(self, d: int) -> jnp.ndarray:
        """(B, cap_d) bool validity mask."""
        n = self.cap(d)
        i = jnp.arange(n, dtype=jnp.int32)[None, :]
        return i < self.count(d)[:, None]

    def xyz(self, d: int) -> jnp.ndarray:
        """(B, cap_d, 3) int32 voxel coords of each node (0 for padding)."""
        k = self.key(d)
        return jnp.where((k < SENTINEL)[..., None], morton.decode(k), 0)

    @property
    def batch_size(self) -> int:
        return self.leaf_mean.shape[0]


def _unique_sorted(skeys: jnp.ndarray, cap: int):
    """Segment sorted keys (with SENTINEL tail) into unique groups.

    Returns (unique_keys (cap,), seg_id (P,), count ()). Entries mapping
    past ``cap`` (overflow) or invalid are assigned seg_id == cap.
    """
    valid = skeys < SENTINEL
    head = jnp.concatenate(
        [valid[:1], (skeys[1:] != skeys[:-1]) & valid[1:]])
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg_id = jnp.where(valid, jnp.minimum(seg_id, cap), cap)
    ukeys = jnp.full((cap + 1,), SENTINEL, dtype=jnp.int32)
    ukeys = ukeys.at[seg_id].set(skeys, mode="drop")[:cap]
    # restore SENTINEL in the overflow-dump slot semantics: slot `cap`
    # was dropped by slicing; padding tail keeps SENTINEL because those
    # seg_ids were never < count.
    true_count = jnp.sum(head.astype(jnp.int32))
    count = jnp.minimum(true_count, cap)
    return ukeys, seg_id, count, true_count - count


def _build_single(points: jnp.ndarray, pmask: jnp.ndarray, depth: int,
                  min_depth: int, caps: Tuple[int, ...],
                  normals: Optional[jnp.ndarray] = None):
    """Build one sample's octree. points: (P, 3) in [-1,1], pmask: (P,),
    normals: optional (P, 3) per-point normals averaged per leaf."""
    nlev = depth - min_depth + 1
    assert len(caps) == nlev
    grid = morton.points_to_grid(points, depth)
    keys = jnp.where(pmask, morton.encode(grid), SENTINEL)
    order = jnp.argsort(keys)
    skeys = keys[order]
    spts = points[order]
    svalid = skeys < SENTINEL

    cap_leaf = caps[-1]
    leaf_keys, seg_id, leaf_count, ovf = _unique_sorted(skeys, cap_leaf)
    # Mean point position per leaf (for 'P' input features).
    w = svalid.astype(jnp.float32)
    pt_sum = jax.ops.segment_sum(spts * w[:, None], seg_id,
                                 num_segments=cap_leaf + 1)[:cap_leaf]
    pt_cnt = jax.ops.segment_sum(w, seg_id,
                                 num_segments=cap_leaf + 1)[:cap_leaf]
    leaf_mean = pt_sum / jnp.maximum(pt_cnt, 1.0)[:, None]
    leaf_normal = None
    if normals is not None:
        # Mean point normal per leaf octant, matching ocnn's per-octant
        # average of point attributes (the 'N' input feature source).
        n_sum = jax.ops.segment_sum(normals[order] * w[:, None], seg_id,
                                    num_segments=cap_leaf + 1)[:cap_leaf]
        leaf_normal = n_sum / jnp.maximum(pt_cnt, 1.0)[:, None]

    keys_all = [None] * nlev
    counts_all = [None] * nlev
    parents_all = [None] * nlev
    keys_all[-1] = leaf_keys
    counts_all[-1] = leaf_count

    child_keys = leaf_keys
    for d in range(depth - 1, min_depth - 1, -1):
        lev = d - min_depth
        cvalid = child_keys < SENTINEL
        pkeys_of_child = jnp.where(cvalid, child_keys >> 3, SENTINEL)
        ukeys, seg_id_d, count_d, ovf_d = _unique_sorted(
            pkeys_of_child, caps[lev])
        ovf = ovf + ovf_d
        keys_all[lev] = ukeys
        counts_all[lev] = count_d
        parents_all[lev + 1] = jnp.where(
            cvalid & (seg_id_d < caps[lev]), seg_id_d, -1).astype(jnp.int32)
        child_keys = ukeys
    return (tuple(keys_all), tuple(counts_all), tuple(parents_all),
            leaf_mean, pt_cnt, ovf, leaf_normal)


def build_batched_octree(points: jnp.ndarray, pmask: jnp.ndarray,
                         depth: int, min_depth: int,
                         caps: Optional[Tuple[int, ...]] = None,
                         normals: Optional[jnp.ndarray] = None
                         ) -> BatchedOctree:
    """Build a BatchedOctree from (B, P, 3) points with (B, P) validity.
    ``normals``: optional (B, P, 3) per-point normals ('N' features).

    Fully jit-compatible; vmapped over the batch axis so it shards along
    the data-parallel mesh axis with zero communication.
    """
    assert points.ndim == 3 and points.shape[-1] == 3
    if caps is None:
        caps = default_capacities(points.shape[1], depth, min_depth)
    if normals is None:
        build = lambda p, m: _build_single(p, m, depth, min_depth, caps)
        (keys, counts, parents, leaf_mean, leaf_npts, overflow,
         leaf_normal) = jax.vmap(build)(points, pmask)
    else:
        build = lambda p, m, n: _build_single(p, m, depth, min_depth,
                                              caps, n)
        (keys, counts, parents, leaf_mean, leaf_npts, overflow,
         leaf_normal) = jax.vmap(build)(points, pmask, normals)
    # vmap maps None -> None inside tuples only if structure matches;
    # parents[0] is None per-sample, tuples come back with None preserved.
    return BatchedOctree(depth=depth, min_depth=min_depth, caps=caps,
                         keys=keys, counts=counts, parents=parents,
                         leaf_mean=leaf_mean, leaf_npts=leaf_npts,
                         overflow=overflow, leaf_normal=leaf_normal)
