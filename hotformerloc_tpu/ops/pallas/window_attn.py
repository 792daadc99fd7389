"""Fused windowed attention with in-kernel RPE — the Pallas TPU kernel
replacing the materialised attention of the reference's OctreeAttention
(/root/reference/models/octformer_backbone.py:69-85).

Why fused: the XLA path materialises, per layer, the (B, W, H, T, T)
logit tensor AND the RPE bias in HBM, and the RPE table lookup lowers to
an HBM gather measured at ~2.8 ms/call on v5e (docs/PROFILE.md round 3:
WindowAttention gathers alone are >30% of the train step). This kernel
keeps each window tile resident in VMEM: logits, softmax, and the RPE
bias never touch HBM, and there is no gather anywhere.

Window packing (round 5): at the production shapes each window is
T = 48-49 tokens with head dim 16, so every per-head dot is a
(49, 16) x (16, 49) matmul — one full 128x128x128 MXU pass at ~2%
utilisation, and the batched-small-dot passes dominate kernel time
(docs/PROFILE.md r4: 3-5x headroom estimate). ``pack`` windows are
fused into one row block of pack*T <= 128 rows with a static
block-diagonal mask killing cross-window logits: every T x T dot
becomes a pack*T x pack*T dot, cutting the MXU pass count ~pack-fold
for ~pack-fold wasted lanes that were already padding. Relay slots and
packing are handled uniformly via SENTINEL COORDS: xyz covers all T
slots per window, relay/padding slots carry coordinate -1 whose one-hot
row is zero, so their RPE bias rows/cols vanish exactly.

Layout rule (round-5 chip regression, BENCH r5 first run): the one-hot
row count is whatever the xyz operand's last dim is, and Mosaic only
accepts the (WT, rows, P) -> (WT*rows, P) collapse behind these dots
when ``rows`` is sublane-aligned (multiple of 8) OR P is a full 128
lanes. T = K + G = 49 sentinel rows with P = 2^depth < 128 (depths 4-6
of the flagship config) is rejected ("unsupported shape cast",
vector<16x49x16xbf16> -> vector<784x16xbf16>). So for pack == 1 callers
pass xyz WITHOUT relay columns — (BW, 3, K) with K 8-aligned, the
chip-proven r4 form — and the kernel pads the (K, K) bias by the
inferred G = Tp - K. The sentinel form (xyz covering all Tp slots) is
for pack > 1, where the row block is a multiple of T anyway.

RPE formulation (chosen after on-chip compiler probes —
tools/mosaic_probe.py): the per-axis bias is
bias_a[t, s] = table[clip(x_a[t] - x_a[s], ±bnd), h], i.e. a lookup
in the (P, P) pair matrix Delta_a,h[p, q] = table[clip(p - q)] with
P = 2^depth the static coordinate range. Delta is tiny and built OUTSIDE
the kernel by a fold-matrix matmul; in-kernel the bias per tile is two
small MXU matmuls per axis:  U_a @ Delta_a  and  (·) @ U_a^T  with
U_a = one-hot(x_a) of shape (WT, Tp, P). This avoids the
(WT, K, K, 3num) one-hot whose size crashes this toolchain's Mosaic
backend, and every dot has ONE batch dim and ONE contraction (the only
forms the compiler accepts).

The backward recomputes the forward per tile (flash-attention style)
and emits dq/dk/dv plus the RPE table gradient reduced IN-KERNEL to the
per-axis pair matrices (FUSE_DTAB) — no scatter-add ever reaches XLA on
either path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


def _delta_tables(table, pos_bnd: int, P: int, dtype):
    """(3*num, H) table -> (3, P, H*P) per-axis pair-bias matrices.

    Delta[a, p, h*P + q] = table[a*num + clip(p - q, ±bnd) + bnd, h].
    Built with a fold one-hot matmul (no gather); differentiable, but
    only consumed in the forward — table grads flow through the dbias
    path in the custom VJP.
    """
    num = 2 * pos_bnd + 1
    p = jnp.arange(P, dtype=jnp.int32)
    diff = jnp.clip(p[:, None] - p[None, :], -pos_bnd, pos_bnd) + pos_bnd
    fold = jax.nn.one_hot(diff, num, dtype=jnp.float32)      # (P, P, num)
    H = table.shape[-1]
    outs = []
    for a in range(3):
        tab_a = table[a * num:(a + 1) * num, :].astype(jnp.float32)
        d = jnp.einsum("pqj,jh->phq", fold, tab_a,
                       preferred_element_type=jnp.float32)   # (P, H, P)
        outs.append(d.reshape(P, H * P))
    return jnp.stack(outs, axis=0).astype(dtype)             # (3, P, H*P)


def _axis_tensors(xyz_ref, delta_ref, P: int, Tp: int, cdt):
    """Per-axis one-hots U_a (WT, Tp, P) and V_a = U_a @ Delta_a
    (WT, Tp, H*P). Sentinel coords (-1, relay/padding slots) produce
    all-zero one-hot rows, so their bias rows/cols are exactly 0."""
    WT = xyz_ref.shape[0]
    us, vs = [], []
    for a in range(3):
        c = xyz_ref[:, a, :]                                 # (WT, Tp)
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, Tp, P), 2)
        u = (col == c[..., None]).astype(cdt)                # (WT, Tp, P)
        v = jax.lax.dot_general(
            u, delta_ref[a], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)  # (WT, Tp, H*P)
        us.append(u)
        vs.append(v)
    return us, vs


def _head_bias(us, vs, h: int, P: int):
    """bias_h (WT, Tp, Tp) = sum_a V_a[:, :, hP:(h+1)P] @ U_a^T."""
    bias = None
    for a in range(3):
        vh = vs[a][:, :, h * P:(h + 1) * P]
        b = jax.lax.dot_general(
            vh, us[a], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (WT, Tp, Tp)
        bias = b if bias is None else bias + b
    return bias


def _head_logits(q_ref, k_ref, h: int, hd: int, scale: float):
    qh = q_ref[:, :, h * hd:(h + 1) * hd]
    kh = k_ref[:, :, h * hd:(h + 1) * hd]
    return jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # (WT, Tp, Tp)


def _pack_mask(Tp: int, pack: int):
    """Additive (Tp, Tp) f32 block-diagonal mask: 0 within a window,
    MASK_VALUE across packed windows."""
    if pack <= 1:
        return None
    T = Tp // pack
    r = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0) // T
    c = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1) // T
    return jnp.where(r == c, 0.0, MASK_VALUE)


def _masked_attn(logits, mask_add, blockmask, rvalid):
    """fp32 softmax with key mask + cross-window block mask; rows whose
    query slot is invalid are zeroed exactly (their garbage would
    otherwise couple packed windows through dv/dk)."""
    if blockmask is not None:
        logits = logits + blockmask[None]
    attn = jax.nn.softmax(logits + mask_add, axis=-1)
    return attn * rvalid[:, :, None]


def _fwd_kernel(q_ref, k_ref, v_ref, xyz_ref, mask_ref, delta_ref, o_ref,
                *, num_heads: int, pack: int, coord_range: int,
                use_rpe: bool):
    WT, Tp, C = q_ref.shape
    H = num_heads
    hd = C // H
    P = coord_range
    cdt = q_ref.dtype
    scale = hd ** -0.5
    # G > 0: xyz covers only the K = Tp - G node slots (8-aligned rows,
    # see module docstring); the bias is zero-padded over the G leading
    # relay slots as in the reference (octformer_backbone.py:87-94).
    G = Tp - xyz_ref.shape[2]
    rvalid = (mask_ref[:] > 0).astype(jnp.float32)           # (WT, Tp)
    mask_add = jnp.where(mask_ref[:] > 0, 0.0,
                         MASK_VALUE)[:, None, :]             # (WT, 1, Tp)
    blockmask = _pack_mask(Tp, pack)
    if use_rpe:
        us, vs = _axis_tensors(xyz_ref, delta_ref, P, Tp - G, cdt)
    for h in range(H):
        logits = _head_logits(q_ref, k_ref, h, hd, scale)
        if use_rpe:
            bh = _head_bias(us, vs, h, P)
            if G > 0:
                bh = jnp.pad(bh, ((0, 0), (G, 0), (G, 0)))
            logits = logits + bh
        attn = _masked_attn(logits, mask_add, blockmask, rvalid).astype(cdt)
        vh = v_ref[:, :, h * hd:(h + 1) * hd]
        out = jax.lax.dot_general(
            attn, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (WT, Tp, hd)
        o_ref[:, :, h * hd:(h + 1) * hd] = out.astype(cdt)


def _bwd_kernel(q_ref, k_ref, v_ref, xyz_ref, mask_ref, delta_ref, g_ref,
                dq_ref, dk_ref, dv_ref, db_ref, *, num_heads: int,
                pack: int, coord_range: int, use_rpe: bool,
                fuse_dtab: bool):
    """Backward tile. With ``fuse_dtab`` the RPE table gradient is
    reduced IN-KERNEL to the per-axis pair matrix db_ref (3, P, H*P)
    f32, grid-accumulated — instead of spilling the full per-pair
    cotangent dbias (H, BW, Tp, Tp) to HBM and reducing it in XLA
    (VERDICT r3 #3: that spill was ~52-104 MB per layer per microbatch
    and a large share of step bytes). The reference's CUDA weight-grad
    kernel does its reduction on-device in shared memory the same way
    (/root/reference/libs/dwconv/csrc/dwconv.cu:44-72).
    """
    WT, Tp, C = q_ref.shape
    H = num_heads
    hd = C // H
    P = coord_range
    cdt = q_ref.dtype
    scale = hd ** -0.5
    G = Tp - xyz_ref.shape[2]          # relay slots outside xyz (fwd rule)
    rvalid = (mask_ref[:] > 0).astype(jnp.float32)
    mask_add = jnp.where(mask_ref[:] > 0, 0.0, MASK_VALUE)[:, None, :]
    blockmask = _pack_mask(Tp, pack)
    if use_rpe:
        us, vs = _axis_tensors(xyz_ref, delta_ref, P, Tp - G, cdt)
        if fuse_dtab:
            @pl.when(pl.program_id(0) == 0)
            def _():
                db_ref[:] = jnp.zeros_like(db_ref)
            dms = [[], [], []]       # per axis: per-head (P, P) blocks
    for h in range(H):
        logits = _head_logits(q_ref, k_ref, h, hd, scale)
        if use_rpe:
            bh = _head_bias(us, vs, h, P)
            if G > 0:
                bh = jnp.pad(bh, ((0, 0), (G, 0), (G, 0)))
            logits = logits + bh
        attn = _masked_attn(logits, mask_add, blockmask, rvalid)  # fp32
        gh = g_ref[:, :, h * hd:(h + 1) * hd]
        vh = v_ref[:, :, h * hd:(h + 1) * hd]
        attn_c = attn.astype(cdt)
        # dv[s] = sum_t attn[t, s] * g[t]    (contract t, batch WT)
        dv = jax.lax.dot_general(
            attn_c, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (WT, Tp, hd)
        dv_ref[:, :, h * hd:(h + 1) * hd] = dv.astype(cdt)
        # dattn[t, s] = g[t] . v[s]          (contract hd)
        dattn = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dlog = attn * (dattn - jnp.sum(dattn * attn, axis=-1,
                                       keepdims=True))       # (WT, Tp, Tp)
        dl_c = dlog.astype(cdt)
        qh = q_ref[:, :, h * hd:(h + 1) * hd]
        kh = k_ref[:, :, h * hd:(h + 1) * hd]
        dq = jax.lax.dot_general(
            dl_c, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (WT, Tp, hd)
        dq_ref[:, :, h * hd:(h + 1) * hd] = (dq * scale).astype(cdt)
        # dk[s] = scale * sum_t dlogits[t, s] * q[t]  (contract t)
        dk = jax.lax.dot_general(
            dl_c, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (WT, Tp, hd)
        dk_ref[:, :, h * hd:(h + 1) * hd] = (dk * scale).astype(cdt)
        if use_rpe and not fuse_dtab:
            db_ref[h] = dl_c                                 # (WT, Tp, Tp)
        elif use_rpe:
            # In-kernel P-decomposition of the table grad: per axis a,
            # m_a[p, q] = sum_{w,t,s} U_a[w,t,p] dlog[w,t,s] U_a[w,s,q]
            # — two MXU contractions; the (P, P) result is tiny.
            # Sentinel rows have U = 0, and cross-window dlog entries
            # are exactly 0 (block mask -> attn 0), so no spurious
            # contributions. With G > 0 the relay rows/cols carry no
            # bias, so only the (K, K) node block contributes.
            dlK = dl_c[:, G:, G:] if G > 0 else dl_c
            for a in range(3):
                c1 = jax.lax.dot_general(
                    dlK, us[a], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # (WT, K, P)
                # m[p, q] = sum_{w,t} U[w,t,p] c1[w,t,q]: batch-w
                # contraction over t (the chip-proven _head_bias form;
                # a (WT*Tp, P) flattening is an unsupported Mosaic
                # shape cast), then a VPU sum over w.
                mw = jax.lax.dot_general(
                    us[a], c1.astype(cdt), (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # (WT, P, P)
                dms[a].append(jnp.sum(mw, axis=0))
    if use_rpe and fuse_dtab:
        dm = jnp.stack([jnp.concatenate(dms[a], axis=1)
                        for a in range(3)], axis=0)   # (3, P, H*P)
        db_ref[:] = db_ref[:] + dm


def _specs3(WT, Tp, C, delta_shape, Kx):
    """Kx: xyz last dim — K node slots (pack==1, G relay slots padded
    in-kernel) or the full Tp sentinel layout (pack>1)."""
    tile3 = pl.BlockSpec((WT, Tp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return [
        tile3, tile3, tile3,
        pl.BlockSpec((WT, 3, Kx), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((WT, Tp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(delta_shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ], tile3


def _call_fwd(q, k, v, xyz, mask, delta, num_heads, pack,
              coord_range, use_rpe, window_tile, interpret):
    BW, Tp, C = q.shape
    WT = window_tile
    assert BW % WT == 0, (BW, WT)
    kern = functools.partial(_fwd_kernel, num_heads=num_heads,
                             pack=pack, coord_range=coord_range,
                             use_rpe=use_rpe)
    in_specs, tile3 = _specs3(WT, Tp, C, delta.shape, xyz.shape[2])
    return pl.pallas_call(
        kern,
        grid=(BW // WT,),
        in_specs=in_specs,
        out_specs=tile3,
        out_shape=jax.ShapeDtypeStruct((BW, Tp, C), q.dtype),
        interpret=interpret,
    )(q, k, v, xyz, mask, delta)


# In-kernel RPE table-grad reduction (VERDICT r3 #3). When False the
# backward spills the full (H, BW, Tp, Tp) per-pair cotangent to HBM and
# reduces it in XLA (_dtab_from_dbias) — kept as a fallback / A/B path.
FUSE_DTAB = True


def _call_bwd(q, k, v, xyz, mask, delta, g, num_heads, pack,
              coord_range, use_rpe, window_tile, interpret):
    BW, Tp, C = q.shape
    WT = window_tile
    H = num_heads
    P = coord_range
    fuse = FUSE_DTAB and use_rpe
    kern = functools.partial(_bwd_kernel, num_heads=num_heads,
                             pack=pack, coord_range=coord_range,
                             use_rpe=use_rpe, fuse_dtab=fuse)
    in_specs, tile3 = _specs3(WT, Tp, C, delta.shape, xyz.shape[2])
    if fuse:
        db_spec = pl.BlockSpec((3, P, H * P), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        db_shape = jax.ShapeDtypeStruct((3, P, H * P), jnp.float32)
    else:
        db_spec = pl.BlockSpec((H, WT, Tp, Tp), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)
        db_shape = jax.ShapeDtypeStruct((H, BW, Tp, Tp), q.dtype)
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        grid=(BW // WT,),
        in_specs=in_specs + [tile3],
        out_specs=[tile3, tile3, tile3, db_spec],
        out_shape=[jax.ShapeDtypeStruct((BW, Tp, C), q.dtype),
                   jax.ShapeDtypeStruct((BW, Tp, C), q.dtype),
                   jax.ShapeDtypeStruct((BW, Tp, C), q.dtype),
                   db_shape],
        interpret=interpret,
    )(q, k, v, xyz, mask, delta, g)
    return dq, dk, dv, dbias


def _dtab_from_dbias(dbias, xyz, pos_bnd: int, coord_range: int):
    """Scatter-free RPE table gradient at the XLA level (fallback path).

    dbias: (H, BW, Tp, Tp) per-pair bias cotangent from the bwd kernel;
    xyz: (BW, 3, Tp) int32 axis-plane coords (sentinel -1 rows drop out
    of the one-hot). Same P-decomposition as ops/rpe.py:_rpe_bwd —
    per-axis coordinate one-hots U contract dbias down to (H, P, P),
    then the constant Toeplitz fold maps to table rows. Three einsums
    per axis, no scatter. Returns (3*num, H) fp32.
    """
    P = int(coord_range)
    num = 2 * pos_bnd + 1
    p = jnp.arange(P, dtype=jnp.int32)
    diff = jnp.clip(p[:, None] - p[None, :], -pos_bnd, pos_bnd) + pos_bnd
    fold = jax.nn.one_hot(diff, num, dtype=jnp.float32)      # (P, P, num)
    parts = []
    for a in range(3):
        u = jax.nn.one_hot(xyz[:, a, :], P, dtype=dbias.dtype)  # (BW,Tp,P)
        c1 = jnp.einsum("hbts,bsq->hbtq", dbias, u,
                        preferred_element_type=jnp.float32)
        m = jnp.einsum("btp,hbtq->hpq", u.astype(jnp.float32), c1,
                       preferred_element_type=jnp.float32)
        parts.append(jnp.einsum("hpq,pqj->jh", m, fold,
                                preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=0)                    # (3*num, H)


def _dtab_from_dm(dm, pos_bnd: int, coord_range: int):
    """Fused-path epilogue: (3, P, H*P) in-kernel pair-matrix grads ->
    (3*num, H) table rows via the constant Toeplitz fold. Tiny."""
    P = int(coord_range)
    num = 2 * pos_bnd + 1
    H = dm.shape[-1] // P
    p = jnp.arange(P, dtype=jnp.int32)
    diff = jnp.clip(p[:, None] - p[None, :], -pos_bnd, pos_bnd) + pos_bnd
    fold = jax.nn.one_hot(diff, num, dtype=jnp.float32)      # (P, P, num)
    parts = []
    for a in range(3):
        m = dm[a].reshape(P, H, P)                           # (p, h, q)
        parts.append(jnp.einsum("phq,pqj->jh", m, fold,
                                preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=0)                    # (3*num, H)


def _head_blocks(C: int, H: int) -> int:
    """Channel-block count: kernels above 128 channels exceed the v5e
    16 MB scoped-VMEM limit in the backward (measured: 17.42M at
    C=256/H=16), so heads are processed in independent 128-channel
    blocks — each block is the measured-fast C=128/H=8 configuration.
    Heads never mix across channel blocks (head h owns channels
    [h*hd, (h+1)*hd)), so the split is exact."""
    nb = max(1, C // 128)
    while H % nb != 0 or C % nb != 0:
        nb -= 1
    return nb


def _fwd_impl(q, k, v, xyz, mask, table, num_heads, pack,
              pos_bnd, use_rpe, window_tile, interpret, coord_range):
    C = q.shape[-1]
    nb = _head_blocks(C, num_heads)
    hb, cb = num_heads // nb, C // nb
    cr = coord_range if use_rpe else 1
    outs = []
    for i in range(nb):
        sl = slice(i * cb, (i + 1) * cb)
        tab_i = table[:, i * hb:(i + 1) * hb] if use_rpe else table
        delta = (_delta_tables(tab_i, pos_bnd, coord_range, q.dtype)
                 if use_rpe else jnp.zeros((3, 1, cb), q.dtype))
        outs.append(_call_fwd(q[:, :, sl], k[:, :, sl], v[:, :, sl], xyz,
                              mask, delta, hb, pack, cr, use_rpe,
                              window_tile, interpret))
    return outs[0] if nb == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_window_attention(q, k, v, xyz, mask, table, num_heads: int,
                           pack: int, pos_bnd: int, use_rpe: bool,
                           window_tile: int = 8, interpret: bool = False,
                           coord_range: int = 128):
    """q/k/v: (BW, Tp, C) with ``pack`` windows of T = Tp/pack tokens
    fused per row block; xyz: int32 axis-plane coords — (BW, 3, K) node
    slots only for pack == 1 (K = Tp - G must be 8-aligned; the kernel
    zero-pads the bias over the G leading relay slots), or the full
    (BW, 3, Tp) sentinel layout for pack > 1 (-1 at relay/padding slots
    -> zero one-hot row -> zero bias row/col);
    mask: (BW, Tp) int32; table: (3*(2*pos_bnd+1), H) fp32.
    coord_range statically bounds the coords (2^depth). Returns
    (BW, Tp, C). Invalid-query rows return exactly 0."""
    return _fwd_impl(q, k, v, xyz, mask, table, num_heads, pack,
                     pos_bnd, use_rpe, window_tile, interpret, coord_range)


def _fwd_rule(q, k, v, xyz, mask, table, num_heads, pack, pos_bnd,
              use_rpe, window_tile, interpret, coord_range):
    out = _fwd_impl(q, k, v, xyz, mask, table, num_heads, pack,
                    pos_bnd, use_rpe, window_tile, interpret, coord_range)
    return out, (q, k, v, xyz, mask, table)


def _bwd_rule(num_heads, pack, pos_bnd, use_rpe, window_tile,
              interpret, coord_range, res, g):
    q, k, v, xyz, mask, table = res
    C = q.shape[-1]
    nb = _head_blocks(C, num_heads)
    hb, cb = num_heads // nb, C // nb
    cr = coord_range if use_rpe else 1
    dqs, dks, dvs, dtabs = [], [], [], []
    for i in range(nb):
        sl = slice(i * cb, (i + 1) * cb)
        tab_i = table[:, i * hb:(i + 1) * hb] if use_rpe else table
        delta = (_delta_tables(tab_i, pos_bnd, coord_range, q.dtype)
                 if use_rpe else jnp.zeros((3, 1, cb), q.dtype))
        dq, dk, dv, dbias = _call_bwd(
            q[:, :, sl], k[:, :, sl], v[:, :, sl], xyz, mask, delta,
            g[:, :, sl], hb, pack, cr, use_rpe, window_tile,
            interpret)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
        if use_rpe and FUSE_DTAB:
            dtabs.append(_dtab_from_dm(dbias, pos_bnd, coord_range))
        elif use_rpe:
            Gx = q.shape[1] - xyz.shape[2]   # relay slots outside xyz
            db = dbias[:, :, Gx:, Gx:] if Gx > 0 else dbias
            dtabs.append(_dtab_from_dbias(db, xyz, pos_bnd, coord_range))
    if nb == 1:
        dq, dk, dv = dqs[0], dks[0], dvs[0]
    else:
        dq = jnp.concatenate(dqs, axis=-1)
        dk = jnp.concatenate(dks, axis=-1)
        dv = jnp.concatenate(dvs, axis=-1)
    if use_rpe:
        dtab = (dtabs[0] if nb == 1
                else jnp.concatenate(dtabs, axis=1)).astype(table.dtype)
    else:
        dtab = jnp.zeros_like(table)
    return (dq, dk, dv, None, None, dtab)


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)
