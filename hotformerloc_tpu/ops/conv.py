"""Octree convolution primitives as gather + MXU matmul.

TPU-native replacements for the reference's conv stack:
  * `octree_conv`   ~ ocnn.nn.OctreeConv (stride 1, odd kernel), used by
    the PatchEmbed stem (/root/reference/models/octformer_backbone.py:430-437)
    and xCPE (/root/reference/models/layers/octformer_layers.py:122-142).
  * `octree_dwconv` ~ the repo's CUDA depthwise kernel
    (/root/reference/libs/dwconv/csrc/dwconv.cu:24-42): out[n, c] =
    sum_k w[k, c] * x[neigh[n, k], c]. On TPU this is a bandwidth-bound
    VPU op; the gather-accumulate loop below fuses into a handful of XLA
    kernels (a Pallas variant lives in ops/pallas/).
  * `octree_down_conv` ~ kernel-[2] stride-2 OctreeConv (Downsample,
    /root/reference/models/octformer_backbone.py:456-469), expressed as a
    gather over each parent's 8 children.
  * `global_pool`   ~ ocnn.nn.OctreeGlobalPool (per-sample masked mean).

All inputs are per-sample dense node arrays (B, N, C) with -1-padded
gather tables, so every op is a static-shape batched computation.
Autodiff: `jnp.take_along_axis` + `where` differentiate to the exact
scatter-adjoint the reference implements manually with its
inverse-neighbour CUDA trick (/root/reference/libs/dwconv/csrc/dwconv.cu:74-97);
XLA generates that for free.
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_tap(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather one tap: x (B, N, C), idx (B, N) with -1 missing -> (B, N, C)."""
    safe = jnp.maximum(idx, 0)
    g = jnp.take_along_axis(x, safe[..., None], axis=1)
    return jnp.where((idx >= 0)[..., None], g, 0)


def octree_conv(x: jnp.ndarray, neigh: jnp.ndarray, w: jnp.ndarray,
                b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 octree conv. x: (B, N, Cin), neigh: (B, N, K), w: (K, Cin, Cout).

    Tap-loop formulation: K gathers + K (N, Cin) @ (Cin, Cout) matmuls.
    Avoids materialising the (B, N, K, Cin) patch tensor in HBM while
    keeping the contraction on the MXU.
    """
    K = w.shape[0]
    assert neigh.shape[-1] == K
    out = None
    for k in range(K):
        g = _gather_tap(x, neigh[..., k])
        t = jnp.einsum("bnc,co->bno", g, w[k],
                       preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def octree_dwconv(x: jnp.ndarray, neigh: jnp.ndarray,
                  w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise octree conv. x: (B, N, C), neigh: (B, N, K), w: (K, C)."""
    K = w.shape[0]
    assert neigh.shape[-1] == K
    out = jnp.zeros_like(x)
    for k in range(K):
        out = out + _gather_tap(x, neigh[..., k]) * w[k]
    return out


def octree_down_conv(x: jnp.ndarray, children: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-[2] stride-2 conv: children (B, N_parent, 8), w (8, Cin, Cout)."""
    return octree_conv(x, children, w, b)


def global_pool(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over nodes: x (B, N, C), valid (B, N) -> (B, C)."""
    vf = valid.astype(x.dtype)
    s = jnp.einsum("bnc,bn->bc", x, vf)
    n = jnp.maximum(jnp.sum(vf, axis=1), 1.0)
    return s / n[:, None]
