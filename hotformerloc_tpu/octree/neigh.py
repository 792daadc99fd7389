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