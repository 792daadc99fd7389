"""Neighbour / child index tables via sorted-key binary search.

The reference obtains (N, K) gather tables from the external ocnn engine
(`octree.get_neigh`, used by the CUDA dwconv at
/root/reference/libs/dwconv/dwconv/nn.py:59 and by `ocnn.nn.OctreeConv`).
We rebuild them natively: node keys are Morton-sorted per sample, so a
neighbour lookup is `searchsorted` of the neighbour's Morton key — a
batched O(K·N·log N) integer op that XLA vectorises well on TPU.

Index convention: -1 marks a missing neighbour (outside the volume, or an
empty octant), matching the reference CUDA kernel's convention
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


def _binary_search(sorted_keys: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Lower-bound binary search, unrolled to log2(N) vectorised steps.

    jnp.searchsorted's 'sort'/'scan' strategies compile poorly under
    vmap on this workload; an explicit unrolled bisection is a handful
    of gathers + compares that XLA fuses cleanly on TPU.
    """
    n = sorted_keys.shape[0]
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)
    steps = max(1, (n + 1).bit_length())
    for _ in range(steps):
        mid = (lo + hi) >> 1
        pred = sorted_keys[jnp.minimum(mid, n - 1)] < v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _lookup_keys(sorted_keys: jnp.ndarray, query: jnp.ndarray,
                 count: jnp.ndarray) -> jnp.ndarray:
    """Find each query key in one sample's sorted key array.

    sorted_keys: (N,) ascending with SENTINEL tail. query: any shape.
    Returns int32 indices, -1 where not found / not a valid node.
    """
    n = sorted_keys.shape[0]
    flat = query.reshape(-1)
    idx = _binary_search(sorted_keys, flat)
    idx_c = jnp.minimum(idx, n - 1)
    hit = (sorted_keys[idx_c] == flat) & (idx_c < count) & (flat < SENTINEL)
    return jnp.where(hit, idx_c, -1).reshape(query.shape)


def neigh_table(octree: BatchedOctree, depth: int,
                kernel: str = "333") -> jnp.ndarray:
    """(B, N_d, K) gather table for a stride-1 conv at ``depth``."""
    offsets = jnp.asarray(kernel_offsets(kernel))  # (K, 3)
    keys = octree.key(depth)
    counts = octree.count(depth)
    lim = 2**depth

    def one(keys_b, count_b):
        xyz = morton.decode(jnp.where(keys_b < SENTINEL, keys_b, 0))
        nxyz = xyz[:, None, :] + offsets[None, :, :]  # (N, K, 3)
        inside = jnp.all((nxyz >= 0) & (nxyz < lim), axis=-1)
        valid_node = keys_b < SENTINEL
        nkey = jnp.where(inside & valid_node[:, None],
                         morton.encode(nxyz), SENTINEL)
        return _lookup_keys(keys_b, nkey, count_b)

    return jax.vmap(one)(keys, counts)


def child_table(octree: BatchedOctree, depth: int) -> jnp.ndarray:
    """(B, N_{depth-1}, 8) indices of each parent's children at ``depth``.

    Backs the stride-2 / kernel-2 octree convolutions used by the stem
    downsamples and inter-stage Downsample
    (/root/reference/models/octformer_backbone.py:433-435,456-469):
    out[parent] = sum_k W_k . x[child_k], missing children contribute 0.
    """
    pkeys = octree.key(depth - 1)
    ckeys = octree.key(depth)
    ccounts = octree.count(depth)

    def one(pkeys_b, ckeys_b, ccount_b):
        valid_p = pkeys_b < SENTINEL
        oct_ids = jnp.arange(8, dtype=jnp.int32)[None, :]
        q = jnp.where(valid_p[:, None], (pkeys_b[:, None] << 3) | oct_ids,
                      SENTINEL)
        return _lookup_keys(ckeys_b, q, ccount_b)

    return jax.vmap(one)(pkeys, ckeys, ccounts)
