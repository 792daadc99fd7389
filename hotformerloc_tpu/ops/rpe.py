"""Relative-position bias (RPE) with a scatter-free custom adjoint.

Forward semantics match the reference RPE
(/root/reference/models/layers/octformer_layers.py:144-174): per axis,
index a (3*(2*bnd+1), H) table with the clipped coordinate difference
of every (query, key) pair in a window and sum over the three axes.

Why a custom VJP: the autodiff adjoint of the forward's table gather is
a scatter-add of B*W*K*K indices into the tiny table — XLA lowers that
to a serial per-index loop, measured at ~33% of the whole train step on
a v5e (docs/PROFILE.md, round 2). Here the backward is reformulated as
MXU matmuls using per-axis coordinate one-hots:

    dtable_a[j]  = sum_{b,w,t,s} 1{ia[b,w,t,s] = j} * dbias[b,w,h,t,s]
                 = sum_{p,q} FOLD[p,q,j] * (U_a^T dbias U_a)[h,p,q]

with U_a[b,w,k,p] = 1{xyz[b,w,k,a] = p} over the static coordinate
range P = 2^depth and FOLD[p,q,j] = 1{clip(p-q,-bnd,bnd)+bnd = j} the
constant Toeplitz-diagonal fold. Three matmuls, no scatter — the same
trick the conv stack uses (ops/conv.py) and the one-hot formulation the
Pallas kernel uses in-kernel (ops/pallas/window_attn.py:34-63).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rpe_bias_reference(tab_t: jnp.ndarray, xyz_w: jnp.ndarray,
                       bnd: int) -> jnp.ndarray:
    """Plain-autodiff RPE bias. tab_t: (H, 3*(2*bnd+1)) table transposed
    to keep K (not H or 3) as every temp's minor dim; xyz_w: (B, W, K, 3)
    int32 window node coords. Returns (B, W, H, K, K) in tab_t.dtype."""
    num = 2 * bnd + 1
    bias = None
    for a in range(3):
        rel = xyz_w[:, :, :, None, a] - xyz_w[:, :, None, :, a]  # (B,W,K,K)
        ia = jnp.clip(rel, -bnd, bnd) + bnd + a * num
        ba = jnp.take(tab_t, ia, axis=1)                 # (H, B, W, K, K)
        bias = ba if bias is None else bias + ba
    return jnp.moveaxis(bias, 0, 2)                      # (B, W, H, K, K)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rpe_bias(tab_t, xyz_w, bnd, coord_range):
    """RPE bias whose table-gradient is computed with matmuls instead of
    a scatter-add. ``coord_range`` must statically bound the coords
    (P = 2^depth)."""
    return rpe_bias_reference(tab_t, xyz_w, bnd)


def _rpe_fwd(tab_t, xyz_w, bnd, coord_range):
    return rpe_bias_reference(tab_t, xyz_w, bnd), xyz_w


def _rpe_bwd(bnd, coord_range, res, dbias):
    xyz_w = res
    tab_dtype = dbias.dtype  # cotangent dtype == output dtype == tab dtype
    P = int(coord_range)
    num = 2 * bnd + 1
    # Constant diagonal fold (P, P, num); XLA constant-folds the iota.
    p = jnp.arange(P, dtype=jnp.int32)
    diff = jnp.clip(p[:, None] - p[None, :], -bnd, bnd) + bnd
    fold = jax.nn.one_hot(diff, num, dtype=jnp.float32)  # (P, P, num)
    parts = []
    for a in range(3):
        u = jax.nn.one_hot(xyz_w[..., a], P, dtype=dbias.dtype)  # (B,W,K,P)
        c1 = jnp.einsum("bwhts,bwsq->bwhtq", dbias, u,
                        preferred_element_type=jnp.float32)
        m = jnp.einsum("bwtp,bwhtq->hpq", u, c1,
                       preferred_element_type=jnp.float32)
        parts.append(jnp.einsum("hpq,pqj->hj", m, fold,
                                preferred_element_type=jnp.float32))
    dtab = jnp.concatenate(parts, axis=1).astype(tab_dtype)
    return (dtab, None)


rpe_bias.defvjp(_rpe_fwd, _rpe_bwd)
