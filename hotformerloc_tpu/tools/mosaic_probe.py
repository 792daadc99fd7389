"""THE on-chip Mosaic probe tool (VERDICT r4 #8: consolidates the
probe_attn*/probe_gather*/probe_vmem_gather script zoo).

Interpret mode (CPU tests) accepts everything; the REAL Mosaic backend
rejects >1 batch dim in matmuls, minor-dim reshapes, oversized one-hot
temporaries, etc. Verified constraints live in
docs/MOSAIC_CONSTRAINTS.md — run the relevant subcommand BEFORE
committing to a kernel design, and update the doc with new findings.

Subcommands (run on the real chip):
  python -m hotformerloc_tpu.tools.mosaic_probe constructs
      one tiny kernel per construct the fused attention kernel uses
  python -m hotformerloc_tpu.tools.mosaic_probe attn
      full fused_window_attention compile/run bisect over
      (H, C, G, pack, window_tile) from the proven octf point toward
      larger shapes, fwd and bwd
  python -m hotformerloc_tpu.tools.mosaic_probe gather
      in-kernel row-gather formulations (dwconv design space) with
      timings vs a correctness oracle
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotformerloc_tpu.utils.profiling import fetch_sync

WT, T, C, H, K, R = 8, 49, 256, 16, 48, 231
hd = C // H


def _run(name, kernel, out_shape, *args, specs=None):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=specs or [pl.BlockSpec(memory_space=pltpu.VMEM)
                               for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        print(json.dumps({"probe": name, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e)[:200]}), flush=True)


def constructs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (WT, T, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (WT, T, C)), jnp.bfloat16)
    idx3 = jnp.asarray(rng.integers(0, R, (WT, K, K)), jnp.int32)
    tab = jnp.asarray(rng.normal(0, 1, (R, H)), jnp.float32)
    logits = jnp.asarray(rng.normal(0, 1, (WT, T, T)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 1, (WT, K, K)), jnp.float32)

    # 1. head-loop matmul: 1 batch dim, minor static lane slice
    def k_headloop(q_ref, k_ref, o_ref):
        acc = jnp.zeros((WT, T, T), jnp.float32)
        for h in range(2):
            qh = q_ref[:, :, h * hd:(h + 1) * hd]
            kh = k_ref[:, :, h * hd:(h + 1) * hd]
            acc += jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    _run("headloop_1batch_dot_laneslice", k_headloop,
         jax.ShapeDtypeStruct((WT, T, T), jnp.float32), q, k)

    # 2. minor-dim reshape (WT, K, K) -> (WT*K*K, 1)
    def k_reshape(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(WT * K * K, 1).astype(jnp.float32)
    _run("reshape_3d_to_flatcol", k_reshape,
         jax.ShapeDtypeStruct((WT * K * K, 1), jnp.float32), idx3)

    # 3. 4D one-hot + dot_general contracting minor (no batch dims)
    def k_onehot4d(i_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    _run("onehot4d_dot_minor", k_onehot4d,
         jax.ShapeDtypeStruct((WT, K, K, H), jnp.float32), idx3, tab)

    # 4. adjoint form: contract 3 major dims (R,H output)
    def k_dtab(i_ref, g_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, g_ref[:].astype(jnp.bfloat16),
            (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)
    g4 = jnp.asarray(rng.normal(0, 1, (WT, K, K, H)), jnp.float32)
    _run("dtab_contract_majors", k_dtab,
         jax.ShapeDtypeStruct((R, H), jnp.float32), idx3, g4)

    # 5. jnp.pad on middle dims (bias (WT,K,K) -> (WT,T,T) with G=1)
    def k_pad(b_ref, o_ref):
        o_ref[:] = jnp.pad(b_ref[:], ((0, 0), (1, 0), (1, 0)))
    _run("pad_middle_dims", k_pad,
         jax.ShapeDtypeStruct((WT, K + 1, K + 1), jnp.float32), bias)

    # 6. scalar-broadcast accumulation loop (77 selects per axis)
    def k_selloop(i_ref, t_ref, o_ref):
        acc = jnp.zeros((WT, K, K), jnp.float32)
        for r in range(4):                      # truncated: construct test
            acc += jnp.where(i_ref[:] == r, t_ref[r, 0], 0.0)
        o_ref[:] = acc
    _run("scalar_select_loop", k_selloop,
         jax.ShapeDtypeStruct((WT, K, K), jnp.float32), idx3, tab)

    # 7. fp32 softmax on (WT, T, T)
    def k_softmax(l_ref, o_ref):
        o_ref[:] = jax.nn.softmax(l_ref[:], axis=-1)
    _run("softmax3d", k_softmax,
         jax.ShapeDtypeStruct((WT, T, T), jnp.float32), logits)

    # 8. store into minor lane slice of output
    def k_slicestore(q_ref, o_ref):
        for h in range(2):
            o_ref[:, :, h * hd:(h + 1) * hd] = \
                q_ref[:, :, h * hd:(h + 1) * hd] * 2.0
    _run("lane_slice_store", k_slicestore,
         jax.ShapeDtypeStruct((WT, T, 2 * hd), jnp.bfloat16), q)

    # 9. transposed-q dot: (WT,T,hd)x(WT,T,hd) contract T (dk-style)
    def k_dk(q_ref, k_ref, o_ref):
        qh = q_ref[:, :, :hd]
        kh = k_ref[:, :, :hd]
        o_ref[:] = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    _run("dot_contract_sublane", k_dk,
         jax.ShapeDtypeStruct((WT, hd, hd), jnp.float32), q, k)

    # 10. packed-windows bias dot: rows = pack*T (within one tile)
    def k_packbias(q_ref, k_ref, o_ref):
        qq = q_ref[:, :, :hd]
        kk = k_ref[:, :, :hd]
        o_ref[:] = jax.lax.dot_general(
            qq, kk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    q2 = jnp.asarray(rng.normal(0, 1, (WT // 2, 2 * T, C)), jnp.bfloat16)
    _run("packed_rows_dot", k_packbias,
         jax.ShapeDtypeStruct((WT // 2, 2 * T, 2 * T), jnp.float32), q2, q2)


def attn_cases(bwd_too: bool = True):
    """Compile/run the REAL fused kernel across shape points — the
    bisection path that found the wt16 fix and the wt32 crash
    (docs/PALLAS_AB*.json)."""
    from hotformerloc_tpu.ops.pallas.window_attn import \
        fused_window_attention
    BW, K_, BND = 704, 48, 38

    def case(name, H_, C_, G_, pack=1, wt=8, bwd=False, P=128):
        T_ = K_ + G_
        rng = np.random.default_rng(0)
        BWp = BW // pack
        Tp = pack * T_
        q = jnp.asarray(rng.normal(0, 1, (BWp, Tp, C_)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (BWp, Tp, C_)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (BWp, Tp, C_)), jnp.bfloat16)
        # pack==1: node-only coords (kernel G-pads; the r5 full-Tp
        # sentinel layout is Mosaic-rejected for P < 128 lanes);
        # pack>1: full sentinel layout.
        Kx = K_ if pack == 1 else Tp
        xyz = jnp.asarray(rng.integers(0, P, (BWp, 3, Kx)), jnp.int32)
        mask = jnp.ones((BWp, Tp), jnp.int32)
        tab = jnp.asarray(rng.normal(0, 0.1, (3 * (2 * BND + 1), H_)),
                          jnp.float32)
        try:
            if bwd:
                def loss(q, k, v, tab):
                    return jnp.sum(fused_window_attention(
                        q, k, v, xyz, mask, tab, H_, pack, BND, True, wt,
                        False, P).astype(jnp.float32) ** 2)
                out = jax.jit(jax.grad(loss, argnums=(0, 3)))(q, k, v, tab)
            else:
                out = jax.jit(lambda q, k, v, tab: fused_window_attention(
                    q, k, v, xyz, mask, tab, H_, pack, BND, True, wt,
                    False, P))(q, k, v, tab)
            fetch_sync(jax.tree_util.tree_leaves(out)[0])
            print(json.dumps({"case": name, "ok": True}), flush=True)
            return True
        except Exception as e:
            print(json.dumps({"case": name, "ok": False,
                              "err": str(e)[:110]}), flush=True)
            return False

    case("base_H8_C128_G0", 8, 128, 0)
    case("H16_C256_G1", 16, 256, 1)
    case("H16_C256_G1_wt16", 16, 256, 1, wt=16)
    # small coord ranges = the pyramid's lower depths (P = 2^depth).
    # The r5 sentinel layout crashed exactly here (49 rows, 16 lanes).
    case("H16_C256_G1_wt16_P16", 16, 256, 1, wt=16, P=16)
    case("H16_C256_G1_wt16_P32", 16, 256, 1, wt=16, P=32)
    case("H16_C256_G1_p2_wt8", 16, 256, 1, pack=2, wt=8)
    case("H16_C256_G1_p2_wt16", 16, 256, 1, pack=2, wt=16)
    if bwd_too:
        case("bwd_H8_C128_G0", 8, 128, 0, bwd=True)
        case("bwd_H16_C256_G1", 16, 256, 1, bwd=True)
        case("bwd_H16_C256_G1_wt16_P16", 16, 256, 1, wt=16, P=16,
             bwd=True)
        case("bwd_H16_C256_G1_p2_wt8", 16, 256, 1, pack=2, wt=8, bwd=True)


def _try_timed(name, build, check=None):
    try:
        fn = jax.jit(build())
        out = fn()
        fetch_sync(out)
        md = None
        if check is not None:
            md = float(np.abs(np.asarray(out, np.float32) - check).max())
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        fetch_sync(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(json.dumps({"probe": name, "ok": True, "ms": round(ms, 4),
                          "maxdiff": md}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e)[:160]}), flush=True)


def gather():
    """In-kernel row-gather formulations for the dwconv design space
    (the probes that motivated the banded kernel,
    ops/pallas/band_conv.py)."""
    rng = np.random.default_rng(0)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    for (Nx, TN, C_, dt) in [(512, 512, 256, jnp.float32),
                             (4224, 512, 256, jnp.bfloat16),
                             (4224, 4224, 256, jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(0, 1, (Nx, C_)), dt)
        idx = jnp.asarray(rng.integers(0, Nx, (TN,)), jnp.int32)
        want = np.asarray(x, np.float32)[np.asarray(idx)]

        def k_take(x_ref, i_ref, o_ref, TN=TN, C_=C_):
            ib = jnp.broadcast_to(i_ref[:][:, None], (TN, C_))
            o_ref[:] = jnp.take_along_axis(x_ref[:], ib, axis=0)

        def build(x=x, idx=idx, k=k_take, TN=TN, C_=C_, dt=dt):
            f = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((TN, C_), dt),
                in_specs=[vm(), vm()], out_specs=vm())
            return lambda: f(x, idx)

        _try_timed(f"take2d_N{Nx}_T{TN}_{jnp.dtype(dt).name}", build, want)

    Nx, TN, C_ = 4224, 512, 256
    x = jnp.asarray(rng.normal(0, 1, (Nx, C_)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, Nx, (TN,)), jnp.int32)
    want = np.asarray(x, np.float32)[np.asarray(idx)]

    def k_jtake(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    def build_jtake():
        f = pl.pallas_call(
            k_jtake, out_shape=jax.ShapeDtypeStruct((TN, C_), jnp.float32),
            in_specs=[vm(), vm()], out_specs=vm())
        return lambda: f(x, idx)

    _try_timed("jnp_take_axis0", build_jtake, want)

    def k_rowloop(i_ref, x_ref, o_ref):
        def body(j, _):
            r = i_ref[j]
            o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, TN, body, 0)

    def build_rowloop():
        f = pl.pallas_call(
            k_rowloop,
            out_shape=jax.ShapeDtypeStruct((TN, C_), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vm()],
            out_specs=vm())
        return lambda: f(idx, x)

    _try_timed("rowloop_dynslice", build_rowloop, want)

    G_, TT = 8, 512
    idx2 = jnp.asarray(rng.integers(0, Nx, (G_ * TT,)), jnp.int32)
    want2 = np.asarray(x, np.float32)[np.asarray(idx2)]

    def k_tiled(x_ref, i_ref, o_ref):
        ib = jnp.broadcast_to(i_ref[:][:, None], (TT, C_))
        o_ref[:] = jnp.take_along_axis(x_ref[:], ib, axis=0)

    def build_tiled():
        f = pl.pallas_call(
            k_tiled, grid=(G_,),
            in_specs=[vm((Nx, C_), lambda g: (0, 0)),
                      vm((TT,), lambda g: (g,))],
            out_specs=vm((TT, C_), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((G_ * TT, C_), jnp.float32))
        return lambda: f(x, idx2)

    _try_timed("take_grid_tiled", build_tiled, want2)


def band():
    """Banded-conv (halo, escape-capacity) sweep at the CPE hot shape
    (VERDICT r5: the band matmul cost is ~(S+2*HR)/S per node and the
    escape-path gathers scale with the STATIC capacity E, not the
    actual escape count — so HR/E are the static levers).

    Prints fwd / fwd+bwd ms and the realised hard-node fraction per
    (HR, E-divisor) combo on synthetic z-order tables, plus maxdiff vs
    the flat-gather oracle."""
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.octree.neigh import all_neigh_tables, child_table
    from hotformerloc_tpu.ops.conv import octree_dwconv
    from hotformerloc_tpu.ops.pallas.band_conv import (_band_loc,
                                                       banded_dwconv,
                                                       build_band_tables)
    B, C, depth, N_TARGET = 8, 256, 6, 4224
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (B, 4096, 3)), jnp.float32)
    msk = jnp.ones((B, 4096), bool)
    oc = build_batched_octree(pts, msk, depth, depth,
                              (N_TARGET,))
    childrens = (None,)
    neigh = all_neigh_tables(oc, childrens)[0]
    x = jnp.asarray(rng.normal(0, 1, (B, neigh.shape[1], C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.2, (27, C)), jnp.float32)
    ref = np.asarray(jax.jit(octree_dwconv)(x, neigh, w), np.float32)
    for S in (128,):
        for HR in (128, 64, 32):
            for ediv in (8, 16):
                bt = jax.jit(functools.partial(
                    build_band_tables, S=S, HR=HR,
                    cap=neigh.shape[1] // ediv))(neigh)
                loc = jax.jit(functools.partial(
                    _band_loc, S=S, HR=HR))(neigh)
                ovf = int(np.asarray(jnp.sum(bt.overflow)))
                hard = float(np.mean(np.asarray(bt.hard_idx) >= 0))

                def fwd(x, w, loc=loc, bt=bt):
                    return banded_dwconv(x, loc, w, bt)

                def fb(x, w, loc=loc, bt=bt):
                    return jax.grad(lambda x, w: jnp.sum(
                        banded_dwconv(x, loc, w, bt)
                        .astype(jnp.float32) ** 2), argnums=(0, 1))(x, w)

                try:
                    jf = jax.jit(fwd)
                    out = jf(x, w)
                    fetch_sync(out)
                    md = float(np.abs(np.asarray(out, np.float32)
                                      - ref).max())
                    t0 = time.perf_counter()
                    for _ in range(20):
                        out = jf(x, w)
                    fetch_sync(out)
                    f_ms = (time.perf_counter() - t0) / 20 * 1e3
                    jb = jax.jit(fb)
                    g = jb(x, w)
                    fetch_sync(g[0])
                    t0 = time.perf_counter()
                    for _ in range(20):
                        g = jb(x, w)
                    fetch_sync(g[0])
                    fb_ms = (time.perf_counter() - t0) / 20 * 1e3
                    print(json.dumps(
                        {"S": S, "HR": HR, "ediv": ediv,
                         "fwd_ms": round(f_ms, 3),
                         "fwd_bwd_ms": round(fb_ms, 3),
                         "hard_frac": round(hard, 4),
                         "overflow": ovf,
                         "maxdiff": round(md, 5)}), flush=True)
                except Exception as e:
                    print(json.dumps({"S": S, "HR": HR, "ediv": ediv,
                                      "err": str(e)[:140]}), flush=True)


def main():
    import sys
    cmd = sys.argv[1] if len(sys.argv) > 1 else "constructs"
    if cmd == "constructs":
        constructs()
    elif cmd == "attn":
        attn_cases()
    elif cmd == "gather":
        gather()
    elif cmd == "band":
        band()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}; "
                         "use constructs | attn | gather | band")


if __name__ == "__main__":
    main()
