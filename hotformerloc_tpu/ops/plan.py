"""Precomputed gather tables + per-level context for a forward pass.

The static-shape analogue of `OctreeT.build_t`
(/root/reference/models/octree.py:95-111): everything the transformer
needs per depth, computed once per batch inside jit. Unlike the
reference (which materialises every attention mask / relative-position
tensor up front), we keep the plan lean — masks and rel-pos derive
cheaply from node validity and coords inside the modules, letting XLA
fuse them into the attention kernels.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from hotformerloc_tpu.octree.build import BatchedOctree
from hotformerloc_tpu.octree.neigh import all_neigh_tables, child_table


@struct.dataclass
class LevelCtx:
    """Per-depth context handed to transformer blocks."""
    depth: int = struct.field(pytree_node=False)
    node_valid: jnp.ndarray     # (B, N) bool
    xyz: jnp.ndarray            # (B, N, 3) int32 voxel coords
    neigh: jnp.ndarray          # (B, N, 27) stride-1 gather table
    keys: jnp.ndarray = None    # (B, N) sorted Morton keys (dense dwconv)
    counts: jnp.ndarray = None  # (B,) valid node counts
    band: object = None         # Optional[band_conv.BandTables]
    dense_idx: jnp.ndarray = None  # (B, 8^d) voxel->node map (dense CPE)


@struct.dataclass
class OctreePlan:
    """BatchedOctree + all gather tables the model consumes."""
    octree: BatchedOctree
    neighs: Tuple[jnp.ndarray, ...]               # per level, (B, N_d, 27)
    childrens: Tuple[Optional[jnp.ndarray], ...]  # per level d, (B, N_{d-1}, 8)
    # Per-level escape bookkeeping for the banded Pallas conv path
    # (ops/pallas/band_conv.py); None where banding is off/unviable.
    bands: Tuple[object, ...] = ()
    # Per-level (B, 8^d) voxel->node maps for the dense-grid CPE path —
    # hoisted here because the serial binary search behind them would
    # otherwise be replayed per CPE block under remat (ops/conv.
    # dense_voxel_index).
    dense_idxs: Tuple[Optional[jnp.ndarray], ...] = ()

    def level_ctx(self, d: int) -> LevelCtx:
        lev = self.octree.level(d)
        band = self.bands[lev] if self.bands else None
        didx = self.dense_idxs[lev] if self.dense_idxs else None
        return LevelCtx(depth=d, node_valid=self.octree.node_valid(d),
                        xyz=self.octree.xyz(d), neigh=self.neighs[lev],
                        keys=self.octree.key(d), counts=self.octree.count(d),
                        band=band, dense_idx=didx)

    def band_overflow(self) -> jnp.ndarray:
        """Total hard-node capacity overflow across banded levels (0 =
        banded results exactly match the flat gather path)."""
        tot = jnp.zeros((), jnp.int32)
        for bt in self.bands:
            if bt is not None:
                tot = tot + jnp.sum(bt.overflow)
        return tot

    def children(self, d: int) -> jnp.ndarray:
        """Gather table pulling depth-d children into depth-(d-1) parents."""
        c = self.childrens[self.octree.level(d)]
        assert c is not None
        return c

    def down_tables(self, d: int):
        """(children, parent, octant) for a stride-2 conv at depth d.

        ``parent``/``octant`` are the inverse of ``children``
        (children[b, p, o] = c iff parent[b, c] = p and octant[b, c] = o)
        and power the scatter-free conv adjoints (ops/conv.py).
        """
        from hotformerloc_tpu.octree.morton import SENTINEL
        key = self.octree.key(d)
        octant = jnp.where(key < SENTINEL, key & 7, 0).astype(jnp.int32)
        return self.children(d), self.octree.parent(d), octant


def build_plan(octree: BatchedOctree, band_depths: Tuple[int, ...] = (),
               band_tile: int = 64, band_halo: int = 256,
               dense_depths: Tuple[int, ...] = ()) -> OctreePlan:
    """Compute neighbour + child tables for every materialised depth.

    Child tables come first (one flat scatter each), then ALL neighbour
    tables are derived top-down by the parent recurrence
    (octree/neigh.all_neigh_tables) — ~13x cheaper on TPU than the
    per-level binary search and differential-tested equal to it.

    band_depths: depths whose stride-1 convs will run the banded Pallas
    path (ModelConfig.band_depths()); their escape tables are compacted
    here, once per plan, and reused by every conv at that level.
    """
    childrens = tuple(
        child_table(octree, d) if d > octree.min_depth else None
        for d in range(octree.min_depth, octree.depth + 1))
    neighs = all_neigh_tables(octree, childrens)
    bands = ()
    if band_depths:
        from hotformerloc_tpu.ops.pallas.band_conv import (build_band_tables,
                                                           pick_tile)

        def _band(d):
            neigh = neighs[octree.level(d)]
            N = neigh.shape[1]
            # Escape capacities sized by voxel occupancy N / 8^d.
            # Measured worst cases (parity clouds + augmented synthetic
            # benchmark batches): coarse ~0.14*N hard nodes (max 15
            # escaped taps/node); depth 7 ~0.10*N hard; depth 8 up to
            # 234 hard at N=4096. The round-4 uniform N//8 default
            # silently overflowed at depths 5-6 and broke conv
            # exactness (~5e-2 descriptor error).
            #
            # Budget, not blank cheque: these caps give ZERO overflow
            # on unaugmented realistic clouds (the exactness/parity
            # bar, tests/test_band_conv.py guard) while augmentation's
            # occupancy tail may drop O(10) taps/step out of ~4e6
            # (~1e-5 relative), always surfaced via the band_overflow
            # stat. Full-margin caps (N//4+24 slots everywhere dense)
            # were measured 6.4% slower on chip for that last 1e-5 —
            # rejected (docs/PROFILE.md r5).
            occ = N / float(8 ** d)
            if occ > 1e-2:
                cap, slots = N // 4, 16
            elif occ > 5e-4:
                cap, slots = N // 8, 8
            else:
                cap, slots = max(64, N // 8), 16
            return build_band_tables(neigh, pick_tile(N, band_tile),
                                     band_halo, cap=cap, slot_cap=slots)

        bands = tuple(
            _band(d) if d in band_depths else None
            for d in range(octree.min_depth, octree.depth + 1))
    dense_idxs = ()
    if dense_depths:
        from hotformerloc_tpu.ops.conv import dense_voxel_index
        dense_idxs = tuple(
            dense_voxel_index(octree.key(d), octree.count(d), d)
            if d in dense_depths else None
            for d in range(octree.min_depth, octree.depth + 1))
    return OctreePlan(octree=octree, neighs=neighs, childrens=childrens,
                      bands=bands, dense_idxs=dense_idxs)
