"""Banded octree convolutions — Pallas TPU kernels for the stride-1
27-tap gathers that dominate the train step.

Why: the flat XLA row gather behind `ops/conv.octree_conv/_dwconv` runs
at ~70 GB/s on v5e regardless of row size or index order
(docs/GATHER_AB.json) — ~8% of HBM bandwidth — and the train-step
profile shows these gathers as the top cost (docs/PROFILE.md). But the
neighbour tables are z-order-local: with a 128-row tile and a ±256-row
halo band, 99.93% of valid taps land inside the band (measured
`onehot_window` escape fraction 0.0007, docs/GATHER_AB.json). So the
gather becomes an MXU problem: per tile, a one-hot (S, K, W) selector
matmul against the VMEM-resident halo band replaces the HBM gather
entirely, and the rare escaping taps are patched exactly via a small
compacted "hard node" list (flat-gathered, O(N/8) rows).

Semantics are EXACTLY those of the flat ops (and hence of the reference
CUDA kernel /root/reference/libs/dwconv/csrc/dwconv.cu:24-42):
  dwconv: out[n, c] = sum_k w[k, c] * x[neigh[n, k], c]
  conv:   out[n, o] = sum_{k, c} w[k, c, o] * x[neigh[n, k], c]
with -1 = missing neighbour. Exactness holds whenever the per-sample
hard-node capacity E is not exceeded; overflow is counted and surfaced
(BandTables.overflow) like octree capacity overflow.

Backward passes never scatter (the repo-wide rule, ops/conv.py): the
input gradient uses the raster-stencil flip identity
dx = conv(dy, neigh, flip-transpose(w)) — itself evaluated with the
same banded kernels — and the weight gradient is accumulated in-kernel
across grid steps (f32, VMEM-resident) plus a tiny escape-tap einsum.

Kernel constructs are restricted to the chip-verified set from
ops/pallas/window_attn.py: `broadcasted_iota` + compare for one-hots,
`dot_general` with at most ONE contraction and no batch dims, static
minor-dim slices, and dynamic sublane slices `ref[0, pl.ds(t*S, W), :]`
with tile-aligned starts. (`take_along_axis` in-kernel crashes this
toolchain's Mosaic backend — docs/GATHER_AB.json pl_take/pl_dw.)
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel geometry. S: tile rows; HR: halo radius; W = S + 2*HR band
# rows resident in VMEM per tile. Chosen from docs/GATHER_AB.json
# (HR=256 -> 0.07% tap escapes on real Oxford tables) and VMEM budget
# (band + one-hot + tap tensor must fit beside the whole-sample x).
DEFAULT_TILE = 64
DEFAULT_HALO = 256
KP = 32  # 27 taps padded to a sublane multiple for weight blocks


@struct.dataclass
class BandTables:
    """Per-level escape bookkeeping for the banded formulation.

    hard nodes = nodes with >= 1 valid tap outside their tile's band.
    E is a static per-level node capacity; Et a static per-level TAP
    capacity. overflow counts hard nodes/taps beyond them (results are
    then missing those escaped-tap contributions — surfaced, never
    silent).

    Two escape layouts coexist:
    - node-level (hard_neigh/hard_esc): every hard node's full K taps,
      gather cost E*K rows — used by the full conv (its banded levels,
      the depth-8/9 stem, have tiny escape sets).
    - slot-level (slot_src/slot_k): each hard node's escaped taps
      COMPACTED into Kc << K slots (measured max 15 escaped taps/node,
      p50 = 2, on the tests/test_reference_parity.py clouds), gather
      cost E*Kc rows — used by the dwconv CPE path, where the coarse
      depths produce 100s of hard nodes. This is what lets E default to
      N//4 without raising the gather bytes (round-5 parity regression:
      the old E = N//8 silently overflowed on realistic clouds at
      depths 5-6, degrading descriptors by ~5e-2).
    """
    tile: int = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    hard_idx: jnp.ndarray    # (B, E) int32 node ids, -1 pad (ascending)
    hard_neigh: jnp.ndarray  # (B, E, K) neigh rows of hard nodes
    hard_esc: jnp.ndarray    # (B, E, K) bool: valid tap outside band
    hard_pos: jnp.ndarray    # (B, N) int32 position in hard list or -1
    slot_src: jnp.ndarray    # (B, E, Kc) int32 source row, -1 pad
    slot_k: jnp.ndarray      # (B, E, Kc) int32 tap index, 0 pad
    overflow: jnp.ndarray    # (B,) int32


def _band_loc(neigh: jnp.ndarray, S: int, HR: int) -> jnp.ndarray:
    """(B, N, K) in-band position of each tap in its tile's padded band
    (W sentinel for missing/escaped taps). Elementwise; XLA-fused."""
    W = S + 2 * HR
    N = neigh.shape[1]
    node = jnp.arange(N, dtype=jnp.int32)[None, :, None]
    base = (node // S) * S - HR
    loc = neigh - base
    ok = (neigh >= 0) & (loc >= 0) & (loc < W)
    return jnp.where(ok, loc, W).astype(jnp.int32)


def _esc_mask(neigh: jnp.ndarray, node_ids: jnp.ndarray, S: int,
              HR: int) -> jnp.ndarray:
    """(..., K) bool: valid tap that falls outside its node's band."""
    W = S + 2 * HR
    base = (node_ids[..., None] // S) * S - HR
    loc = neigh - base
    return (neigh >= 0) & ((loc < 0) | (loc >= W))


def build_band_tables(neigh: jnp.ndarray, S: int = DEFAULT_TILE,
                      HR: int = DEFAULT_HALO,
                      cap: Optional[int] = None,
                      slot_cap: int = 16) -> BandTables:
    """Compact the escape set of a (B, N, K) neighbour table.

    cap: hard-NODE capacity E (default max(64, N // 4) rounded up to 8
    — measured worst case on realistic clouds is ~0.21*N at the coarse
    depths, tests/test_reference_parity.py clouds).
    slot_cap: escaped taps kept per hard node (measured max 15).
    Runs once per plan build (ops/plan.build_plan) and is reused by
    every conv at that level.
    """
    B, N, K = neigh.shape
    if cap is None:
        cap = max(64, N // 4)
    E = -(-cap // 8) * 8
    Kc = min(slot_cap, K)
    node = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    esc = _esc_mask(neigh, node, S, HR)              # (B, N, K)
    is_hard = jnp.any(esc, axis=-1)                  # (B, N)
    n_hard = jnp.sum(is_hard.astype(jnp.int32), axis=-1)
    # Ascending-id compaction: sort key puts hard nodes first, both
    # groups in node order, so hard_idx[:E] is sorted — searchsorted
    # below then inverts it without any scatter.
    key = jnp.where(is_hard, node, N + node)
    order = jnp.argsort(key, axis=-1)[:, :E]         # (B, E)
    got = jnp.take_along_axis(is_hard, order, axis=-1)
    hard_idx = jnp.where(got, order, -1).astype(jnp.int32)
    # Gather the hard rows of neigh/esc (flat, -1-safe).
    from hotformerloc_tpu.ops.conv import _gather_rows
    hard_neigh = _gather_rows(
        neigh.astype(jnp.int32), hard_idx).astype(jnp.int32)
    # _gather_rows zero-fills idx<0 rows; make them fully invalid.
    hard_neigh = jnp.where(hard_idx[..., None] >= 0, hard_neigh, -1)
    hard_esc = _esc_mask(hard_neigh, jnp.maximum(hard_idx, 0), S, HR)
    # Invert: hard_pos[n] = e if hard_idx[e] == n else -1. hard_idx is
    # ascending with -1 -> N sentinel tail, so a vectorised binary
    # search suffices.
    sorted_ids = jnp.where(hard_idx >= 0, hard_idx, N).astype(jnp.int32)
    pos = jax.vmap(jnp.searchsorted)(sorted_ids, node)  # (B, N)
    pos = jnp.clip(pos, 0, E - 1)
    hit = jnp.take_along_axis(sorted_ids, pos, axis=-1) == node
    hard_pos = jnp.where(hit, pos, -1).astype(jnp.int32)
    # Slot compaction along the K axis: each hard node's escaped taps
    # move to the front of Kc slots (sort-front trick, keys = tap index
    # where escaped else K). slot_k pads with 0 but slot_src pads with
    # -1, so padded slots gather zero rows.
    skey = jnp.where(hard_esc,
                     jax.lax.broadcasted_iota(jnp.int32, (B, E, K), 2),
                     K)
    sorder = jnp.sort(skey, axis=-1)[:, :, :Kc]      # (B, E, Kc)
    sgot = sorder < K
    ssafe = jnp.where(sgot, sorder, 0)
    slot_k = ssafe.astype(jnp.int32)
    slot_src = jnp.take_along_axis(hard_neigh, ssafe, axis=-1)
    slot_src = jnp.where(sgot, slot_src, -1).astype(jnp.int32)
    # Taps beyond Kc slots are dropped — counted as overflow.
    per_node = jnp.sum(hard_esc.astype(jnp.int32), axis=-1)
    slot_ovf = jnp.sum(jnp.maximum(per_node - Kc, 0), axis=-1)
    return BandTables(tile=S, halo=HR, hard_idx=hard_idx,
                      hard_neigh=hard_neigh, hard_esc=hard_esc,
                      hard_pos=hard_pos, slot_src=slot_src,
                      slot_k=slot_k,
                      overflow=(jnp.maximum(n_hard - E, 0) + slot_ovf))


# -- kernels ---------------------------------------------------------------


def _tap_onehot(loc, k, S, W, cdt):
    """Tap k's (S, W) one-hot selector from the (S, K) tile-local
    position table. Built as a static lane slice + broadcast compare —
    the 3-D (S, K, W) form needs a leading-dims merge reshape that this
    toolchain's Mosaic rejects ('infer-vector-layout: unsupported shape
    cast', chip-probed)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
    return (col == loc[:, k:k + 1]).astype(cdt)


def _dw_fwd_kernel(xp_ref, loc_ref, w_ref, o_ref, *, S, HR, K):
    """Depthwise banded conv, one (sample, tile) grid step."""
    W = S + 2 * HR
    t = pl.program_id(1)
    start = pl.multiple_of(t * S, S)
    ht = xp_ref[0, pl.ds(start, W), :]               # (W, C)
    loc = loc_ref[0]                                 # (S, K)
    C = ht.shape[-1]
    acc = jnp.zeros((S, C), jnp.float32)
    for k in range(K):
        oh = _tap_onehot(loc, k, S, W, ht.dtype)
        g = jax.lax.dot_general(oh, ht, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + g * w_ref[k, :].astype(jnp.float32)[None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_bwd_kernel(xp_ref, dyp_ref, loc_ref, wf_ref, dx_ref, dw_ref,
                   *, S, HR, K):
    """dx tile (flip identity, band part) + in-band dw accumulation."""
    W = S + 2 * HR
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = pl.multiple_of(t * S, S)
    ht_dy = dyp_ref[0, pl.ds(start, W), :]           # (W, C)
    ht_x = xp_ref[0, pl.ds(start, W), :]
    dy_tile = dyp_ref[0, pl.ds(start + HR, S), :].astype(jnp.float32)
    loc = loc_ref[0]
    C = ht_x.shape[-1]
    acc = jnp.zeros((S, C), jnp.float32)
    rows = []
    for k in range(K):
        oh = _tap_onehot(loc, k, S, W, ht_x.dtype)
        g_dy = jax.lax.dot_general(oh, ht_dy, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        g_x = jax.lax.dot_general(oh, ht_x, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc = acc + g_dy * wf_ref[k, :].astype(jnp.float32)[None]
        rows.append(jnp.sum(g_x * dy_tile, axis=0))  # (C,)
    dx_ref[0] = acc.astype(dx_ref.dtype)
    dwk = jnp.pad(jnp.stack(rows, axis=0), ((0, KP - K), (0, 0)))

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] = dw_ref[:] + dwk


def _conv_fwd_kernel(xp_ref, loc_ref, w_ref, o_ref, *, S, HR, K):
    """Full banded conv: w_ref (KP, C, O)."""
    W = S + 2 * HR
    t = pl.program_id(1)
    start = pl.multiple_of(t * S, S)
    ht = xp_ref[0, pl.ds(start, W), :]
    loc = loc_ref[0]
    O = w_ref.shape[-1]
    acc = jnp.zeros((S, O), jnp.float32)
    cdt = ht.dtype
    for k in range(K):
        oh = _tap_onehot(loc, k, S, W, cdt)
        g = jax.lax.dot_general(oh, ht, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            g.astype(cdt), w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _conv_bwd_kernel(xp_ref, dyp_ref, loc_ref, wf_ref, dx_ref, dw_ref,
                     *, S, HR, K):
    """dx tile via flip-transpose identity + in-band dw accumulation.

    wf_ref: (KP, O, C) flip-transposed kernel; dw_ref: (KP, C, O) f32.
    """
    W = S + 2 * HR
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = pl.multiple_of(t * S, S)
    ht_dy = dyp_ref[0, pl.ds(start, W), :]           # (W, O)
    ht_x = xp_ref[0, pl.ds(start, W), :]             # (W, C)
    dy_tile = dyp_ref[0, pl.ds(start + HR, S), :]    # (S, O)
    loc = loc_ref[0]
    C = ht_x.shape[-1]
    cdt = ht_x.dtype
    acc = jnp.zeros((S, C), jnp.float32)
    dws = []
    for k in range(K):
        oh = _tap_onehot(loc, k, S, W, cdt)
        g_dy = jax.lax.dot_general(oh, ht_dy, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        g_x = jax.lax.dot_general(oh, ht_x, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            g_dy.astype(cdt), wf_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dws.append(jax.lax.dot_general(
            g_x.astype(cdt), dy_tile, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # (C, O)
    dx_ref[0] = acc.astype(dx_ref.dtype)
    dwk = jnp.pad(jnp.stack(dws, axis=0), ((0, KP - K), (0, 0), (0, 0)))

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] = dw_ref[:] + dwk


# -- pallas_call wrappers ---------------------------------------------------


def _pad_x(x, HR):
    return jnp.pad(x, ((0, 0), (HR, HR), (0, 0)))


def _grid_specs(B, N, C, S, HR, K, more_lanes=None):
    Npad = N + 2 * HR
    xs = pl.BlockSpec((1, Npad, C), lambda b, t: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    locs = pl.BlockSpec((1, S, K), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.BlockSpec((1, S, C if more_lanes is None else more_lanes),
                        lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    return (B, N // S), xs, locs, outs


def _band_dw_fwd_call(x, loc, w, S, HR, interpret):
    B, N, C = x.shape
    K = loc.shape[-1]
    grid, xs, locs, outs = _grid_specs(B, N, C, S, HR, K)
    wp = jnp.pad(w, ((0, KP - K), (0, 0))).astype(x.dtype)
    kern = functools.partial(_dw_fwd_kernel, S=S, HR=HR, K=K)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[xs, locs,
                  pl.BlockSpec((KP, C), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=outs,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(_pad_x(x, HR), loc, wp)


def _band_dw_bwd_call(x, dy, loc, w, S, HR, interpret):
    """Returns (dx_band, dw_band): band parts of both gradients."""
    B, N, C = x.shape
    K = loc.shape[-1]
    grid, xs, locs, outs = _grid_specs(B, N, C, S, HR, K)
    wfp = jnp.pad(w[::-1], ((0, KP - K), (0, 0))).astype(x.dtype)
    kern = functools.partial(_dw_bwd_kernel, S=S, HR=HR, K=K)
    dx, dw = pl.pallas_call(
        kern, grid=grid,
        in_specs=[xs, xs, locs,
                  pl.BlockSpec((KP, C), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[outs,
                   pl.BlockSpec((KP, C), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((KP, C), jnp.float32)],
        interpret=interpret,
    )(_pad_x(x, HR), _pad_x(dy, HR), loc, wfp)
    return dx, dw[:K]


def _band_conv_fwd_call(x, loc, w, S, HR, interpret):
    B, N, C = x.shape
    K, _, O = w.shape
    grid, xs, locs, _ = _grid_specs(B, N, C, S, HR, K)
    outs = pl.BlockSpec((1, S, O), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    wp = jnp.pad(w, ((0, KP - K), (0, 0), (0, 0))).astype(x.dtype)
    kern = functools.partial(_conv_fwd_kernel, S=S, HR=HR, K=K)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[xs, locs,
                  pl.BlockSpec((KP, C, O), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=outs,
        out_shape=jax.ShapeDtypeStruct((B, N, O), x.dtype),
        interpret=interpret,
    )(_pad_x(x, HR), loc, wp)


def _band_conv_bwd_call(x, dy, loc, w, S, HR, interpret):
    B, N, C = x.shape
    K, _, O = w.shape
    Npad = N + 2 * HR
    xs = pl.BlockSpec((1, Npad, C), lambda b, t: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    dys = pl.BlockSpec((1, Npad, O), lambda b, t: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    locs = pl.BlockSpec((1, S, K), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)
    dxs = pl.BlockSpec((1, S, C), lambda b, t: (b, t, 0),
                       memory_space=pltpu.VMEM)
    # flip-transpose: adjoint kernel (K, O, C)
    wfp = jnp.pad(jnp.swapaxes(w[::-1], 1, 2),
                  ((0, KP - K), (0, 0), (0, 0))).astype(x.dtype)
    kern = functools.partial(_conv_bwd_kernel, S=S, HR=HR, K=K)
    dx, dw = pl.pallas_call(
        kern, grid=(B, N // S),
        in_specs=[xs, dys, locs,
                  pl.BlockSpec((KP, O, C), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[dxs,
                   pl.BlockSpec((KP, C, O), lambda b, t: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((KP, C, O), jnp.float32)],
        interpret=interpret,
    )(_pad_x(x, HR), _pad_x(dy, HR), loc, wfp)
    return dx, dw[:K]


# -- escape-path corrections (XLA; O(E) flat-gather rows) -------------------


def _slot_w(bt: BandTables, w, dtype):
    """(B, E, Kc, C): per-slot weight row w[slot_k] via a K one-hot
    matmul (a 27-row table gather is slower than the tiny dot here)."""
    K = w.shape[0]
    oh = jax.nn.one_hot(bt.slot_k, K, dtype=dtype)   # (B, E, Kc, K)
    return jnp.einsum("bejk,kc->bejc", oh, w.astype(dtype))


def _esc_dw_rows(x, bt: BandTables, w):
    """(B, E, C): per-hard-node sum of escaped-tap dwconv contributions
    via the SLOT-compacted layout — gathers E*Kc rows instead of E*K
    (Kc = 16 covers the measured max of 15 escaped taps per node; the
    combine is a free sum over the slot axis, no scatter)."""
    from hotformerloc_tpu.ops.conv import _gather_rows
    xg = _gather_rows(x, bt.slot_src)                # (B, E, Kc, C), 0-pad
    return jnp.einsum("bejc,bejc->bec", xg, _slot_w(bt, w, xg.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _esc_conv_rows(x, bt: BandTables, w):
    """(B, E, O) escaped-tap full-conv contributions."""
    from hotformerloc_tpu.ops.conv import _gather_rows
    g = _gather_rows(x, bt.hard_neigh)
    g = g * bt.hard_esc[..., None].astype(g.dtype)
    out = jnp.einsum("bekc,kco->beo", g, w.astype(g.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _place(rows, hard_pos):
    """Scatter-free placement: out[n] = rows[hard_pos[n]] (0 if -1)."""
    from hotformerloc_tpu.ops.conv import _gather_rows
    return _gather_rows(rows, hard_pos)


# -- exact ops with custom VJPs --------------------------------------------


# NOTE: bt (BandTables) is a DIFFERENTIABLE argument with a None
# cotangent — it is an array pytree, and array-valued arguments must
# not go through nondiff_argnums (they arrive as tracers under jit;
# jax raises UnexpectedTracerError). Its static geometry (tile/halo)
# travels as pytree-static fields, so kernels still specialise on it.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def banded_dwconv(x, loc, w, bt: BandTables, interpret: bool = False):
    """Exact depthwise octree conv via the banded kernel + escape patch.

    x: (B, N, C); loc: (B, N, K) from _band_loc; w: (K, C);
    bt: BandTables for the same neighbour table. Numerically equal to
    ops/conv.octree_dwconv (differential-tested) while replacing the
    (B*N*K)-row HBM gather with VMEM-resident MXU selector matmuls.
    """
    S, HR = bt.tile, bt.halo
    band = _band_dw_fwd_call(x, loc, w, S, HR, interpret)
    corr = _place(_esc_dw_rows(x, bt, w), bt.hard_pos)
    return band + corr.astype(band.dtype)


def _banded_dwconv_fwd(x, loc, w, bt, interpret):
    return banded_dwconv(x, loc, w, bt, interpret), (x, loc, w, bt)


def _banded_dwconv_bwd(interpret, res, dy):
    from hotformerloc_tpu.ops.conv import _gather_rows
    x, loc, w, bt = res
    S, HR = bt.tile, bt.halo
    dx_band, dw_band = _band_dw_bwd_call(x, dy, loc, w, S, HR, interpret)
    # dx escape part: the flip identity dx = dwconv(dy, neigh, w[::-1])
    # shares neigh (hence the same escape set): patch with w flipped
    # (w[::-1][slot_k] == w[K-1-slot_k], the flipped tap).
    dx = dx_band + _place(_esc_dw_rows(dy, bt, w[::-1]),
                          bt.hard_pos).astype(dx_band.dtype)
    # dw escape part, slot-level: dw[k, c] = sum over escaped slots with
    # tap k of x[src, c] * dy[dst, c]; -1 pads gather as zero rows.
    xg = _gather_rows(x, bt.slot_src)                # (B, E, Kc, C)
    gdy = _gather_rows(dy, bt.hard_idx)              # (B, E, C)
    oh = jax.nn.one_hot(bt.slot_k, w.shape[0], dtype=x.dtype)
    dw_esc = jnp.einsum("bejk,bejc->kc", oh, xg * gdy[:, :, None, :],
                        preferred_element_type=jnp.float32)
    dw = (dw_band + dw_esc).astype(w.dtype)
    return dx, None, dw, None


banded_dwconv.defvjp(_banded_dwconv_fwd, _banded_dwconv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def banded_conv(x, loc, w, b, bt: BandTables, interpret: bool = False):
    """Exact stride-1 full octree conv (banded). w: (K, C, O); b: (O,)."""
    S, HR = bt.tile, bt.halo
    band = _band_conv_fwd_call(x, loc, w, S, HR, interpret)
    corr = _place(_esc_conv_rows(x, bt, w), bt.hard_pos)
    return band + corr.astype(band.dtype) + b


def _banded_conv_fwd(x, loc, w, b, bt, interpret):
    return banded_conv(x, loc, w, b, bt, interpret), (x, loc, w, bt)


def _banded_conv_bwd(interpret, res, dy):
    from hotformerloc_tpu.ops.conv import _gather_rows
    x, loc, w, bt = res
    S, HR = bt.tile, bt.halo
    dx_band, dw_band = _band_conv_bwd_call(x, dy, loc, w, S, HR, interpret)
    wft = jnp.swapaxes(w[::-1], 1, 2)                # (K, O, C)
    dx = dx_band + _place(_esc_conv_rows(dy, bt, wft),
                          bt.hard_pos).astype(dx_band.dtype)
    gx = _gather_rows(x, bt.hard_neigh) * bt.hard_esc[..., None].astype(
        x.dtype)
    gdy = _gather_rows(dy, bt.hard_idx)
    dw_esc = jnp.einsum("bekc,beo->kco", gx, gdy,
                        preferred_element_type=jnp.float32)
    dw = (dw_band + dw_esc).astype(w.dtype)
    db = jnp.sum(dy, axis=(0, 1)).astype(w.dtype)
    return dx, None, dw, db, None


banded_conv.defvjp(_banded_conv_fwd, _banded_conv_bwd)


def pick_tile(N: int, prefer: int = 128) -> int:
    """Largest tile in {prefer, ..., 64} dividing the level capacity.
    S=128 fills MXU rows (3.31 vs 4.19 ms fwd at C=256 on chip); S=64
    is the fallback for capacities that are only 64-aligned."""
    s = prefer
    while s > 64 and (N % s != 0 or N < 4 * s):
        s //= 2
    return s


def band_viable(N: int, C: int, S: int = DEFAULT_TILE) -> bool:
    """Static check: tile divides the level capacity and the channel
    count is MXU-worthy (tiny-channel convs gather so few bytes the
    flat path already wins)."""
    return N % S == 0 and C >= 32 and N >= 4 * S
