"""Neighbour / child index tables via sorted-key binary search.

The reference obtains (N, K) gather tables from the external ocnn engine
(`octree.get_neigh`, used by the CUDA dwconv at
/root/reference/libs/dwconv/dwconv/nn.py:59 and by `ocnn.nn.OctreeConv`).
We rebuild them natively: node keys are Morton-sorted per sample, so a
neighbour lookup is a vectorised binary search over the key array.

TPU performance notes (measured on v5e):
  * XLA gathers with batch dimensions serialise (~70x slower than flat
    1-D gathers), so the per-sample searches are flattened into ONE
    global index space: sample b's keys live at [b*N, b*N+N) and every
    bisection step is a single unbatched 1-D gather.
  * int coordinate tensors keep their minor dimension large (axis-plane
    (3, N) layout, not (N, 3)) to avoid 42x lane-padding waste.

Index convention: -1 marks a missing neighbour (outside the volume, or
an empty octant), matching the reference CUDA kernel's convention
(/root/reference/libs/dwconv/csrc/dwconv.cu:24-42).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hotformerloc_tpu.octree import morton
from hotformerloc_tpu.octree.build import BatchedOctree
from hotformerloc_tpu.octree.morton import SENTINEL


@lru_cache(maxsize=None)
def kernel_offsets(kernel: str) -> np.ndarray:
    """Static (K, 3) integer offsets for a kernel spec.

    '333' -> 27-tap 3x3x3 neighbourhood centred on the node (offsets in
    {-1,0,1}^3, raster order z fastest to match weight layout determinism).
    '111' -> identity tap.
    """
    sizes = [int(c) for c in kernel]
    assert len(sizes) == 3
    ranges = []
    for s in sizes:
        assert s % 2 == 1, "stride-1 kernels must be odd-sized"
        h = s // 2
        ranges.append(np.arange(-h, h + 1))
    grid = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


def _flat_lookup(keys: jnp.ndarray, counts: jnp.ndarray,
                 query: jnp.ndarray) -> jnp.ndarray:
    """Find query keys in per-sample sorted key arrays, flattened.

    keys: (B, N) sorted ascending with SENTINEL tail; counts: (B,);
    query: (B, M) (SENTINEL = no lookup). Returns (B, M) int32 local
    indices in [0, N), -1 where absent.
    """
    B, N = keys.shape
    M = query.shape[1]
    flat_keys = keys.reshape(B * N)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]     # (B, 1)
    lo = jnp.broadcast_to(base, (B, M)).reshape(-1)
    end = jnp.broadcast_to(base + counts[:, None], (B, M)).reshape(-1)
    hi = end
    v = query.reshape(-1)
    steps = max(1, (N + 1).bit_length())
    for _ in range(steps):
        mid = (lo + hi) >> 1
        km = flat_keys[jnp.minimum(mid, B * N - 1)]          # flat gather
        pred = km < v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    idx = jnp.minimum(lo, B * N - 1)
    hit = (flat_keys[idx] == v) & (v < SENTINEL) & (lo < end)
    local = jnp.where(hit, idx - jnp.repeat(
        base[:, 0], M), -1).astype(jnp.int32)
    return local.reshape(B, M)


def neigh_table(octree: BatchedOctree, depth: int,
                kernel: str = "333") -> jnp.ndarray:
    """(B, N_d, K) gather table for a stride-1 conv at ``depth``."""
    offsets = kernel_offsets(kernel)                # (K, 3) numpy
    K = offsets.shape[0]
    keys = octree.key(depth)                        # (B, N)
    counts = octree.count(depth)
    B, N = keys.shape
    lim = 2**depth
    valid = keys < SENTINEL
    safe = jnp.where(valid, keys, 0)
    # axis-plane coords with a broadcast tap axis: (B, K, N) per axis —
    # one vectorised op chain for all K taps (launch-count matters).
    offs = jnp.asarray(offsets)                      # (K, 3)
    inside = jnp.broadcast_to(valid[:, None, :], (B, K, N))
    nk = jnp.zeros((B, K, N), jnp.int32)
    for a in range(3):
        c = (morton.compact1by2(safe >> (2 - a))[:, None, :]
             + offs[None, :, a, None])               # (B, K, N)
        inside = inside & (c >= 0) & (c < lim)
        nk = nk | (morton.part1by2(c) << (2 - a))
    q = jnp.where(inside, nk, SENTINEL).reshape(B, K * N)
    tab = _flat_lookup(keys, counts, q)
    return jnp.moveaxis(tab.reshape(B, K, N), 1, 2)  # (B, N, K)


# -- table-driven neighbour construction (ocnn construct_all_neigh) ---------
#
# The binary-search neigh_table costs ~95 ms/level on a v5e (13 bisection
# steps of scalar gathers over 27*N queries). The recurrence below is the
# ocnn design (ocnn.octree.Octree.construct_all_neigh): a depth-d node's
# neighbour at offset t lives under its PARENT'S neighbour, and both the
# parent-level tap and the child octant are static functions of
# (own octant, t) — so each level is TWO flat gathers (~7 ms), and only
# the coarsest level needs a real lookup (done densely: one flat scatter
# into an 8^min_depth inverse map + one gather).


@lru_cache(maxsize=None)
def _parent_tap_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static (8, 27) tables: TAP[o, t] = parent-level 27-tap index of the
    parent of (child octant o)'s neighbour at offset t; OCT[o, t] = that
    neighbour's octant within it. Derivation: for per-axis child bit b
    and offset d, the neighbour's parent offset is (b + d) >> 1 and its
    bit is (b + d) & 1."""
    offs = kernel_offsets("333")                     # (27, 3), raster order
    tap = np.zeros((8, 27), np.int32)
    oct_ = np.zeros((8, 27), np.int32)
    for o in range(8):
        bits = np.array([(o >> 2) & 1, (o >> 1) & 1, o & 1])  # x, y, z
        for t in range(27):
            s = bits + offs[t]
            carry = s >> 1                           # in {-1, 0, 1}
            tap[o, t] = np.argmax(np.all(offs == carry, axis=1))
            b2 = s & 1
            oct_[o, t] = (b2[0] << 2) | (b2[1] << 1) | b2[2]
    return tap, oct_


def _dense_base_neigh(octree: BatchedOctree, depth: int) -> jnp.ndarray:
    """Neighbour table at the coarsest depth via a dense inverse map.

    Builds inv[key] -> node index with one flat scatter (8^depth slots
    per sample — only usable at coarse depths), then answers all 27*N
    queries with one flat gather.
    """
    offsets = kernel_offsets("333")
    K = offsets.shape[0]
    keys = octree.key(depth)
    B, N = keys.shape
    lim = 2**depth
    size = lim**3
    valid = keys < SENTINEL
    safe = jnp.where(valid, keys, 0)

    stride = size + 1
    # Padding rows must NOT write into the inverse map: slot `size` is the
    # read-back slot for invalid queries and has to stay -1. Route padding
    # scatters past the end of the buffer so mode="drop" discards them
    # (regression: a non-full base level used to poison slot `size` with
    # the last padding row's id, corrupting every missing neighbour).
    gslot = jnp.where(
        valid,
        jnp.arange(B, dtype=jnp.int32)[:, None] * stride + safe,
        B * stride,
    ).reshape(-1)
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None],
                           (B, N)).reshape(-1)
    inv = jnp.full((B * stride,), -1, jnp.int32)
    inv = inv.at[gslot].set(ids, mode="drop")

    offs = jnp.asarray(offsets)
    inside = jnp.broadcast_to(valid[:, None, :], (B, K, N))
    nk = jnp.zeros((B, K, N), jnp.int32)
    for a in range(3):
        c = (morton.compact1by2(safe >> (2 - a))[:, None, :]
             + offs[None, :, a, None])
        inside = inside & (c >= 0) & (c < lim)
        nk = nk | (morton.part1by2(c) << (2 - a))
    q = jnp.where(inside, nk, size)                 # out-of-volume -> -1 slot
    gq = (jnp.arange(B, dtype=jnp.int32)[:, None, None] * stride + q)
    tab = jnp.take(inv, gq.reshape(-1), axis=0).reshape(B, K, N)
    return jnp.moveaxis(tab, 1, 2)                  # (B, N, K)


def all_neigh_tables(octree: BatchedOctree,
                     childrens: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
    """27-tap neighbour tables for every materialised depth, built
    top-down by the parent recurrence. ``childrens``: per level,
    (B, N_{d-1}, 8) child tables (None at the coarsest level).

    Exactly equals per-level `neigh_table` (differential-tested) at
    ~1/13th the device time.
    """
    tap_np, oct_np = _parent_tap_tables()
    tap_tab = jnp.asarray(tap_np)                   # (8, 27)
    oct_tab = jnp.asarray(oct_np)
    out = [_dense_base_neigh(octree, octree.min_depth)]
    for d in range(octree.min_depth + 1, octree.depth + 1):
        lev = octree.level(d)
        keys = octree.key(d)                        # (B, N)
        B, N = keys.shape
        parent = octree.parent(d)                   # (B, N) into Np
        pneigh = out[-1]                            # (B, Np, 27)
        children = childrens[lev]                   # (B, Np, 8)
        Np = pneigh.shape[1]
        o = jnp.where(keys < SENTINEL, keys & 7, 0).astype(jnp.int32)
        tap = jnp.take(tap_tab, o, axis=0)          # (B, N, 27)
        oct_ = jnp.take(oct_tab, o, axis=0)         # (B, N, 27)
        # parent's neighbour at the static tap: flat gather from pneigh
        base = (jnp.arange(B, dtype=jnp.int32) * Np)[:, None, None]
        pn_idx = (jnp.where(parent >= 0, parent + base[..., 0], 0)[..., None]
                  * 27 + tap)
        pn = jnp.take(pneigh.reshape(-1), pn_idx.reshape(-1),
                      axis=0).reshape(B, N, 27)
        pn = jnp.where(parent[..., None] >= 0, pn, -1)
        # that neighbour's child at the static octant: flat gather
        cn_idx = (jnp.where(pn >= 0, pn + base, 0) * 8 + oct_)
        cn = jnp.take(children.reshape(-1), cn_idx.reshape(-1),
                      axis=0).reshape(B, N, 27)
        cn = jnp.where(pn >= 0, cn, -1)
        out.append(cn)
    return tuple(out)


def child_table(octree: BatchedOctree, depth: int) -> jnp.ndarray:
    """(B, N_{depth-1}, 8) indices of each parent's children at ``depth``.

    Backs the stride-2 / kernel-2 octree convolutions used by the stem
    downsamples and inter-stage Downsample
    (/root/reference/models/octformer_backbone.py:433-435,456-469).
    Built WITHOUT search: the child->parent map from the octree build is
    inverted with one scatter.
    """
    pkeys = octree.key(depth - 1)
    ckeys = octree.key(depth)
    parent = octree.parent(depth)                   # (B, Nc) idx into Np
    B, Nc = ckeys.shape
    Np = pkeys.shape[1]
    octant = jnp.where(ckeys < SENTINEL, ckeys & 7, 0)
    slot = jnp.where(parent >= 0, parent * 8 + octant, Np * 8)
    # flatten the batch into one scatter (batched scatters serialise)
    stride = Np * 8 + 1
    gslot = ((jnp.arange(B, dtype=jnp.int32) * stride)[:, None]
             + slot).reshape(-1)
    child_ids = jnp.broadcast_to(jnp.arange(Nc, dtype=jnp.int32)[None],
                                 (B, Nc)).reshape(-1)
    flat = jnp.full((B * stride,), -1, jnp.int32)
    flat = flat.at[gslot].set(child_ids, mode="drop")
    return flat.reshape(B, stride)[:, :Np * 8].reshape(B, Np, 8)