"""Octree convolution primitives: flat 1-D gathers + MXU matmuls, with
scatter-free custom adjoints.

TPU-native replacements for the reference's conv stack:
  * `octree_conv`   ~ ocnn.nn.OctreeConv (stride 1, odd kernel), used by
    the PatchEmbed stem (/root/reference/models/octformer_backbone.py:430-437)
    and xCPE (/root/reference/models/layers/octformer_layers.py:122-142).
  * `octree_dwconv` ~ the repo's CUDA depthwise kernel
    (/root/reference/libs/dwconv/csrc/dwconv.cu:24-42): out[n, c] =
    sum_k w[k, c] * x[neigh[n, k], c].
  * `octree_down_conv` ~ kernel-[2] stride-2 OctreeConv (Downsample,
    /root/reference/models/octformer_backbone.py:456-469), expressed as a
    gather over each parent's 8 children.
  * `octree_deconv` ~ ocnn.nn.OctreeDeconv, the mutual adjoint of
    `octree_down_conv` from the child's perspective.
  * `global_pool`   ~ ocnn.nn.OctreeGlobalPool (per-sample masked mean).

Two TPU performance rules shape this file (both measured on v5e):

1. GATHERS MUST BE FLAT. An XLA gather with a batch dimension
   (`take_along_axis` on (B, N, C)) serialises per batch row (~70x
   slower than the identical flat gather); every tap gather here folds
   the batch into the row index and issues ONE 1-D row gather.

2. BACKWARD MUST NOT SCATTER. The autodiff adjoint of a gather is a
   scatter-add, which the TPU lowers to a serial per-index loop —
   measured as the dominant cost of the whole train step (~seconds per
   microbatch). Every op here carries a custom VJP that reformulates
   the adjoint as ANOTHER GATHER, exploiting octree-stencil symmetry:

     * stride-1 odd stencils enumerate offsets in raster order, so
       offsets[K-1-k] == -offsets[k]; with neigh[m, k] = node at
       (xyz_m + offsets[k]) it follows that neigh[m, k] = n iff
       neigh[n, K-1-k] = m. Hence dx = conv(dy, neigh, flip-transpose(w))
       — the exact inverse-neighbour trick the reference hand-writes in
       CUDA (/root/reference/libs/dwconv/csrc/dwconv.cu:74-97), realised
       here as pure gathers.
     * down-conv (children table) and deconv (parent+octant tables) are
       mutual adjoints: children[b, p, o] = c iff parent[b, c] = p and
       octant[b, c] = o, so each one's dx is the other's forward with a
       channel-transposed kernel.

   Weight/bias grads are plain einsums over re-gathered activations
   (recomputing a flat gather is far cheaper than saving the patch
   tensor as a residual).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Flat row gather. x: (B, N, C), idx: (B, ...) int32 with -1 for
    missing -> (B, ..., C), zeros where idx < 0.

    The batch axis is folded into the row index so XLA sees one
    unbatched 1-D gather (rule 1 above).
    """
    B, N, C = x.shape
    flat = x.reshape(B * N, C)
    base = jnp.arange(B, dtype=idx.dtype).reshape(
        (B,) + (1,) * (idx.ndim - 1)) * N
    gidx = jnp.where(idx >= 0, idx + base, 0).reshape(-1)
    g = jnp.take(flat, gidx, axis=0)
    g = jnp.where((idx >= 0).reshape(-1)[:, None], g, 0)
    return g.reshape(*idx.shape, C)


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """(K, Cin, Cout) -> (K, Cout, Cin) with taps reversed — the adjoint
    kernel of a symmetric stride-1 stencil."""
    return jnp.swapaxes(w[::-1], 1, 2)


# -- stride-1 full conv -----------------------------------------------------

def _conv_fwd_impl(x, neigh, w, b):
    g = _gather_rows(x, neigh)                       # (B, M, K, C)
    out = jnp.einsum("bnkc,kco->bno", g, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


@partial(jax.custom_vjp, nondiff_argnums=())
def _conv_core(x, neigh, w, b):
    return _conv_fwd_impl(x, neigh, w, b)


def _conv_core_fwd(x, neigh, w, b):
    return _conv_fwd_impl(x, neigh, w, b), (x, neigh, w)


def _conv_core_bwd(res, dy):
    x, neigh, w = res
    # dx: tap-flipped, channel-transposed conv of dy (see module doc).
    dx = _conv_fwd_impl(dy, neigh, _flip_transpose(w), None)
    # dw: einsum over re-gathered activations (contraction over b, n).
    g = _gather_rows(x, neigh)
    dw = jnp.einsum("bnkc,bno->kco", g, dy,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(dy, axis=(0, 1))
    return dx, None, dw, db


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def octree_conv(x: jnp.ndarray, neigh: jnp.ndarray, w: jnp.ndarray,
                b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 octree conv. x: (B, N, Cin), neigh: (B, N, K) from a
    raster-ordered symmetric stencil (octree/neigh.kernel_offsets),
    w: (K, Cin, Cout)."""
    K = w.shape[0]
    assert neigh.shape[-1] == K
    if b is None:
        b = jnp.zeros((w.shape[-1],), x.dtype)
    return _conv_core(x, neigh, w, b)


# -- stride-1 depthwise conv ------------------------------------------------

def _dwconv_fwd_impl(x, neigh, w):
    g = _gather_rows(x, neigh)                       # (B, N, K, C)
    return jnp.einsum("bnkc,kc->bnc", g, w.astype(x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=())
def _dwconv_core(x, neigh, w):
    return _dwconv_fwd_impl(x, neigh, w)


def _dwconv_core_fwd(x, neigh, w):
    return _dwconv_fwd_impl(x, neigh, w), (x, neigh, w)


def _dwconv_core_bwd(res, dy):
    x, neigh, w = res
    dx = _dwconv_fwd_impl(dy, neigh, w[::-1])
    g = _gather_rows(x, neigh)
    dw = jnp.einsum("bnkc,bnc->kc", g, dy,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, None, dw


_dwconv_core.defvjp(_dwconv_core_fwd, _dwconv_core_bwd)


def octree_dwconv(x: jnp.ndarray, neigh: jnp.ndarray,
                  w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise octree conv. x: (B, N, C), neigh: (B, N, K), w: (K, C)."""
    K = w.shape[0]
    assert neigh.shape[-1] == K
    return _dwconv_core(x, neigh, w)


# -- stride-2 down conv / deconv (mutual adjoints) --------------------------

def _down_fwd_impl(x, children, w, b):
    g = _gather_rows(x, children)                    # (B, Np, 8, Cin)
    out = jnp.einsum("bnkc,kco->bno", g, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def _deconv_fwd_impl(x, parent, octant, w, b):
    xp = _gather_rows(x, parent)                     # (B, Nc, Cin)
    oh = jax.nn.one_hot(octant, w.shape[0], dtype=x.dtype)
    out = jnp.einsum("bnc,bnk,kco->bno", xp, oh, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


@partial(jax.custom_vjp, nondiff_argnums=())
def _down_core(x, children, parent, octant, w, b):
    return _down_fwd_impl(x, children, w, b)


def _down_core_fwd(x, children, parent, octant, w, b):
    return (_down_fwd_impl(x, children, w, b),
            (x, children, parent, octant, w))


def _down_core_bwd(res, dy):
    x, children, parent, octant, w = res
    # dx[child] = w[octant(child)]^T dy[parent(child)] — deconv gather.
    dx = _deconv_fwd_impl(dy, parent, octant, jnp.swapaxes(w, 1, 2), None)
    g = _gather_rows(x, children)
    dw = jnp.einsum("bnkc,bno->kco", g, dy,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(dy, axis=(0, 1))
    return dx, None, None, None, dw, db


_down_core.defvjp(_down_core_fwd, _down_core_bwd)


def octree_down_conv(x: jnp.ndarray, children: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None,
                     parent: jnp.ndarray | None = None,
                     octant: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-[2] stride-2 conv: children (B, N_parent, 8), w (8, Cin, Cout).

    ``parent``/``octant`` (the inverse of ``children``; (B, N_child)
    each) enable the scatter-free backward. When omitted the op falls
    back to autodiff through the gather (fine under eval / no-grad).
    """
    if parent is None or octant is None:
        return _down_fwd_impl(x, children, w, b)
    if b is None:
        b = jnp.zeros((w.shape[-1],), x.dtype)
    return _down_core(x, children, parent, octant, w, b)


@partial(jax.custom_vjp, nondiff_argnums=())
def _deconv_core(x, parent, octant, children, w, b):
    return _deconv_fwd_impl(x, parent, octant, w, b)


def _deconv_core_fwd(x, parent, octant, children, w, b):
    return (_deconv_fwd_impl(x, parent, octant, w, b),
            (x, parent, octant, children, w))


def _deconv_core_bwd(res, dy):
    x, parent, octant, children, w = res
    dx = _down_fwd_impl(dy, children, jnp.swapaxes(w, 1, 2), None)
    xp = _gather_rows(x, parent)
    oh = jax.nn.one_hot(octant, w.shape[0], dtype=x.dtype)
    dw = jnp.einsum("bnc,bnk,bno->kco", xp, oh, dy,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(dy, axis=(0, 1))
    return dx, None, None, None, dw, db


_deconv_core.defvjp(_deconv_core_fwd, _deconv_core_bwd)


def octree_deconv(x: jnp.ndarray, parent: jnp.ndarray,
                  octant: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None,
                  children: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-[2] stride-2 transposed conv (upsample): the adjoint of
    `octree_down_conv`, ~ ocnn.nn.OctreeDeconv as consumed by
    OctreeDeconvNormRelu (/root/reference/models/layers/
    octformer_layers.py:101-119; imported by the backbone but never
    instantiated in shipped configs).

    x: (B, N_parent, Cin); parent: (B, N_child) int32 index of each
    child's parent (-1 = padding); octant: (B, N_child) int32 in [0, 8);
    w: (8, Cin, Cout). out[c] = w[octant(c)]^T x[parent(c)] — from the
    child's perspective the scatter becomes a gather, so no scatter op
    ever reaches XLA. ``children`` enables the scatter-free backward.
    """
    assert w.shape[0] == 8
    if children is None:
        return _deconv_fwd_impl(x, parent, octant, w, b)
    if b is None:
        b = jnp.zeros((w.shape[-1],), x.dtype)
    return _deconv_core(x, parent, octant, children, w, b)


# -- dense-grid depthwise conv (coarse depths) ------------------------------
#
# At depth d the voxel volume is V = 8^d; for the coarse pyramid levels
# (V <= ~32k) a dense formulation beats the 27-tap row gather by a wide
# margin: instead of gathering (B, N, 27, C) neighbour rows from HBM
# (~25x below bandwidth on v5e, docs/PROFILE.md), scatter-free-build the
# dense (B, D, D, D, C) grid with ONE V-row gather, run a depthwise 3^3
# lax.conv (native XLA conv emitter), and gather the N node rows back.
# Equivalence with `octree_dwconv` holds exactly: absent octants are
# zero in the grid, matching the -1 = missing convention of the
# reference CUDA kernel (/root/reference/libs/dwconv/csrc/dwconv.cu:24-42).


def _morton_of_raster(depth: int):
    """Constant (V,) Morton key of every raster-ordered voxel."""
    import numpy as np
    D = 2 ** depth
    r = np.arange(D, dtype=np.int64)
    x, y, z = np.meshgrid(r, r, r, indexing="ij")

    def spread(v):
        v = v.astype(np.int64)
        out = np.zeros_like(v)
        for i in range(depth):
            out |= ((v >> i) & 1) << (3 * i)
        return out

    key = (spread(x) << 2) | (spread(y) << 1) | spread(z)
    return key.reshape(-1).astype(np.int32)


def dense_voxel_index(keys, counts, depth: int) -> jnp.ndarray:
    """(B, V) node index of every raster voxel (-1 = empty) — the
    input-independent half of the dense formulation. Costs a 13-step
    serial binary search (~4 ms at depth 4 on v5e), so it is computed
    ONCE per plan (ops/plan.py dense_depths) and reused by every CPE at
    that level; under per-block remat an inline computation would be
    replayed per block."""
    from hotformerloc_tpu.octree.neigh import _flat_lookup
    B = keys.shape[0]
    D = 2 ** depth
    q = jnp.broadcast_to(jnp.asarray(_morton_of_raster(depth))[None],
                         (B, D ** 3))
    return _flat_lookup(keys, counts, q)             # (B, V)


def _to_dense(x, vox_idx, depth: int):
    """(B, N, C) node features -> (B, D, D, D, C) dense grid (zeros at
    empty voxels). vox_idx: (B, V) from dense_voxel_index."""
    B, N, C = x.shape
    D = 2 ** depth
    dense = _gather_rows(x, vox_idx)                 # zeros where idx < 0
    return dense.reshape(B, D, D, D, C)


def _from_dense(dense, xyz, valid):
    """Gather node rows back out of the dense grid; padding nodes -> 0."""
    B = dense.shape[0]
    D = dense.shape[1]
    C = dense.shape[-1]
    vid = (xyz[..., 0] * D + xyz[..., 1]) * D + xyz[..., 2]
    vid = jnp.where(valid, vid, -1)
    return _gather_rows(dense.reshape(B, D ** 3, C), vid)


def _dense_conv(dense, w):
    """Depthwise 3^3 conv on the raster grid. w: (27, C) in the raster
    tap order of octree/neigh.kernel_offsets ((dx, dy, dz), dz fastest),
    which maps directly onto a DHWIO kernel."""
    C = dense.shape[-1]
    w3 = w.reshape(3, 3, 3, 1, C).astype(dense.dtype)
    return jax.lax.conv_general_dilated(
        dense, w3, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C)


def _dwdense_fwd_impl(x, vox_idx, xyz, valid, w, depth):
    dense = _to_dense(x, vox_idx, depth)
    out = _dense_conv(dense, w)
    return _from_dense(out, xyz, valid)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dwdense_core(x, vox_idx, xyz, valid, w, depth):
    return _dwdense_fwd_impl(x, vox_idx, xyz, valid, w, depth)


def _dwdense_fwd(x, vox_idx, xyz, valid, w, depth):
    return (_dwdense_fwd_impl(x, vox_idx, xyz, valid, w, depth),
            (x, vox_idx, xyz, valid, w))


def _dwdense_bwd(depth, res, dy):
    x, vox_idx, xyz, valid, w = res
    dy = jnp.where(valid[..., None], dy, 0)
    # dx = dwconv(dy, flipped taps): raster tap flip == spatial flip.
    dx = _dwdense_fwd_impl(dy, vox_idx, xyz, valid, w[::-1], depth)
    # dw[k, c] = sum over occupied voxels of x[v + off_k] * dy[v]:
    # 27 shifted contractions over the dense grids (no scatter).
    dense_x = _to_dense(x, vox_idx, depth)
    dense_dy = _to_dense(dy, vox_idx, depth)
    D = 2 ** depth
    xp = jnp.pad(dense_x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    parts = []
    for dxo in range(3):
        for dyo in range(3):
            for dzo in range(3):
                sh = xp[:, dxo:dxo + D, dyo:dyo + D, dzo:dzo + D, :]
                parts.append(jnp.einsum(
                    "bxyzc,bxyzc->c", sh, dense_dy,
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(parts, axis=0).astype(w.dtype)    # (27, C)
    return dx, None, None, None, dw


_dwdense_core.defvjp(_dwdense_fwd, _dwdense_bwd)


def octree_dwconv_dense(x: jnp.ndarray, keys: jnp.ndarray,
                        counts: jnp.ndarray, xyz: jnp.ndarray,
                        valid: jnp.ndarray, w: jnp.ndarray,
                        depth: int,
                        vox_idx: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """Depthwise octree conv via a dense voxel grid — numerically equal
    to `octree_dwconv(x, neigh_table(...), w)` at coarse depths.

    x: (B, N, C); keys: (B, N) sorted Morton keys (SENTINEL padding);
    counts: (B,); xyz: (B, N, 3) voxel coords; valid: (B, N);
    w: (27, C) raster-ordered taps; depth: grid depth (V = 8^depth).
    vox_idx: optional precomputed dense_voxel_index(keys, counts, depth)
    — pass the plan-level one (LevelCtx.dense_idx) so the serial binary
    search isn't replayed per CPE call under remat.
    """
    assert w.shape[0] == 27
    if vox_idx is None:
        vox_idx = dense_voxel_index(keys, counts, depth)
    return _dwdense_core(x, vox_idx, xyz, valid, w, depth)


def global_pool(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over nodes: x (B, N, C), valid (B, N) -> (B, C)."""
    vf = valid.astype(x.dtype)
    s = jnp.einsum("bnc,bn->bc", x, vf)
    n = jnp.maximum(jnp.sum(vf, axis=1), 1.0)
    return s / n[:, None]
