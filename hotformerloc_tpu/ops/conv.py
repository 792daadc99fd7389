"""Octree convolution primitives as gather + MXU matmul.

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
  * `global_pool`   ~ ocnn.nn.OctreeGlobalPool (per-sample masked mean).

Formulation: ONE batched row-gather of all taps -> one MXU dot_general
with the (tap, channel) axes contracted. A per-tap Python loop would be
K gathers + K matmuls = ~55 XLA kernels per conv; on this system kernel
launches are expensive, and the single-gather form is also what lets the
dwconv reduce fuse without materialising the patch tensor. Autodiff
through take_along_axis yields the exact scatter-adjoint the reference
hand-writes with its inverse-neighbour CUDA trick
(/root/reference/libs/dwconv/csrc/dwconv.cu:74-97).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_taps(x: jnp.ndarray, neigh: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, C), neigh: (B, M, K) with -1 missing -> (B, M, K, C).

    M may differ from N (stride-2 convs gather depth-d children into
    depth-(d-1) parents).
    """
    B, _, C = x.shape
    _, M, K = neigh.shape
    flat = neigh.reshape(B, M * K)
    safe = jnp.maximum(flat, 0)
    g = jnp.take_along_axis(x, safe[..., None], axis=1)   # (B, M*K, C)
    g = jnp.where((flat >= 0)[..., None], g, 0)
    return g.reshape(B, M, K, C)


def octree_conv(x: jnp.ndarray, neigh: jnp.ndarray, w: jnp.ndarray,
                b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 octree conv. x: (B, N, Cin), neigh: (B, N, K),
    w: (K, Cin, Cout)."""
    K = w.shape[0]
    assert neigh.shape[-1] == K
    g = _gather_taps(x, neigh)
    out = jnp.einsum("bnkc,kco->bno", g, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def octree_dwconv(x: jnp.ndarray, neigh: jnp.ndarray,
                  w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise octree conv. x: (B, N, C), neigh: (B, N, K), w: (K, C).

    Elementwise multiply + tap-sum; XLA fuses the gather into the
    reduction so the (B, N, K, C) patch tensor never reaches HBM.
    """
    K = w.shape[0]
    assert neigh.shape[-1] == K
    g = _gather_taps(x, neigh)
    return jnp.einsum("bnkc,kc->bnc", g, w.astype(x.dtype))


def octree_down_conv(x: jnp.ndarray, children: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-[2] stride-2 conv: children (B, N_parent, 8), w (8, Cin, Cout)."""
    return octree_conv(x, children, w, b)


def octree_deconv(x: jnp.ndarray, parent: jnp.ndarray,
                  octant: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-[2] stride-2 transposed conv (upsample): the adjoint of
    `octree_down_conv`, ~ ocnn.nn.OctreeDeconv as consumed by
    OctreeDeconvNormRelu (/root/reference/models/layers/
    octformer_layers.py:101-119; imported by the backbone but never
    instantiated in shipped configs).

    x: (B, N_parent, Cin); parent: (B, N_child) int32 index of each
    child's parent (-1 = padding); octant: (B, N_child) int32 in [0, 8);
    w: (8, Cin, Cout). out[c] = w[octant(c)]^T x[parent(c)] — from the
    child's perspective the scatter becomes a gather, so no scatter op
    ever reaches XLA.
    """
    assert w.shape[0] == 8
    B, Nc = parent.shape
    safe = jnp.maximum(parent, 0)
    xp = jnp.take_along_axis(x, safe[..., None], axis=1)   # (B, Nc, Cin)
    xp = jnp.where((parent >= 0)[..., None], xp, 0)
    oh = jax.nn.one_hot(octant, 8, dtype=x.dtype)          # (B, Nc, 8)
    out = jnp.einsum("bnc,bnk,kco->bno", xp, oh, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def global_pool(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over nodes: x (B, N, C), valid (B, N) -> (B, C)."""
    vf = valid.astype(x.dtype)
    s = jnp.einsum("bnc,bn->bc", x, vf)
    n = jnp.maximum(jnp.sum(vf, axis=1), 1.0)
    return s / n[:, None]
