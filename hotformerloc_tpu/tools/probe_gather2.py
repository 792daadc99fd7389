"""Second-stage Mosaic gather probes: find ANY accepted+fast in-kernel
row-gather formulation for the dwconv kernel (gather_bench found the
full-shape take_along_axis kernels crash the remote compiler).

Each probe compiles and times one small kernel; results print as JSON
lines. Run on the real chip: python -m hotformerloc_tpu.tools.probe_gather2
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


def _try(name, build, check=None):
    try:
        fn = jax.jit(build())
        out = fn()
        fetch_sync(out)
        ok = True
        md = None
        if check is not None:
            md = float(np.abs(np.asarray(out, np.float32) - check).max())
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        fetch_sync(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(json.dumps({"probe": name, "ok": ok, "ms": round(ms, 4),
                          "maxdiff": md}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e)[:160]}), flush=True)


def main():
    rng = np.random.default_rng(0)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    for (Nx, TN, C, dt) in [(512, 512, 256, jnp.float32),
                            (512, 512, 256, jnp.bfloat16),
                            (4224, 512, 256, jnp.float32),
                            (4224, 512, 256, jnp.bfloat16),
                            (4224, 4224, 256, jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(0, 1, (Nx, C)), dt)
        idx = jnp.asarray(rng.integers(0, Nx, (TN,)), jnp.int32)
        want = np.asarray(x, np.float32)[np.asarray(idx)]

        def k_take(x_ref, i_ref, o_ref, TN=TN, Nx=Nx, C=C):
            ib = jnp.broadcast_to(i_ref[:][:, None], (TN, C))
            o_ref[:] = jnp.take_along_axis(x_ref[:], ib, axis=0)

        def build(x=x, idx=idx, k=k_take, TN=TN, C=C, dt=dt):
            f = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((TN, C), dt),
                in_specs=[vm(), vm()], out_specs=vm())
            return lambda: f(x, idx)

        _try(f"take2d_N{Nx}_T{TN}_{np.dtype(dt.dtype if hasattr(dt,'dtype') else dt).name}",
             build, want)

    # jnp.take variant (gather, not take_along_axis)
    Nx, TN, C = 4224, 512, 256
    x = jnp.asarray(rng.normal(0, 1, (Nx, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, Nx, (TN,)), jnp.int32)
    want = np.asarray(x, np.float32)[np.asarray(idx)]

    def k_jtake(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    def build_jtake():
        f = pl.pallas_call(
            k_jtake, out_shape=jax.ShapeDtypeStruct((TN, C), jnp.float32),
            in_specs=[vm(), vm()], out_specs=vm())
        return lambda: f(x, idx)

    _try("jnp_take_axis0", build_jtake, want)

    # fori_loop with per-row dynamic slice (scalar indices from SMEM)
    def k_rowloop(i_ref, x_ref, o_ref):
        def body(j, _):
            r = i_ref[j]
            o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, TN, body, 0)

    def build_rowloop():
        f = pl.pallas_call(
            k_rowloop,
            out_shape=jax.ShapeDtypeStruct((TN, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vm()],
            out_specs=vm())
        return lambda: f(idx, x)

    _try("rowloop_dynslice", build_rowloop, want)

    # grid-tiled take: grid over node tiles, x full in VMEM each tile
    G, TT = 8, 512
    idx2 = jnp.asarray(rng.integers(0, Nx, (G * TT,)), jnp.int32)
    want2 = np.asarray(x, np.float32)[np.asarray(idx2)]

    def k_tiled(x_ref, i_ref, o_ref):
        ib = jnp.broadcast_to(i_ref[:][:, None], (TT, C))
        o_ref[:] = jnp.take_along_axis(x_ref[:], ib, axis=0)

    def build_tiled():
        f = pl.pallas_call(
            k_tiled, grid=(G,),
            in_specs=[vm((Nx, C), lambda g: (0, 0)),
                      vm((TT,), lambda g: (g,))],
            out_specs=vm((TT, C), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((G * TT, C), jnp.float32))
        return lambda: f(x, idx2)

    _try("take_grid_tiled", build_tiled, want2)

    # dwconv tile: 27 taps on a 512-node tile, x full in VMEM (fp32)
    K = 27
    neigh = jnp.asarray(rng.integers(-1, Nx, (TT, K)), jnp.int32)
    w = jnp.asarray(rng.normal(0, 0.2, (K, C)), jnp.float32)

    def k_dwtile(x_ref, n_ref, w_ref, o_ref):
        xx = x_ref[:]
        nn = n_ref[:]
        ww = w_ref[:]
        acc = jnp.zeros((TT, C), jnp.float32)
        for k in range(K):
            nk = jnp.maximum(nn[:, k], 0)
            g = jnp.take_along_axis(
                xx, jnp.broadcast_to(nk[:, None], (TT, C)), axis=0)
            acc += jnp.where((nn[:, k] >= 0)[:, None], g, 0.0) * ww[k]
        o_ref[:] = acc

    def build_dwtile():
        f = pl.pallas_call(
            k_dwtile,
            out_shape=jax.ShapeDtypeStruct((TT, C), jnp.float32),
            in_specs=[vm(), vm(), vm()], out_specs=vm())
        return lambda: f(x, neigh, w)

    nn = np.asarray(neigh)
    gg = np.where(nn[..., None] >= 0,
                  np.asarray(x, np.float32)[np.maximum(nn, 0)], 0.0)
    want_dw = np.einsum("tkc,kc->tc", gg, np.asarray(w, np.float32))
    _try("dwconv_tile512_fp32", build_dwtile, want_dw)


if __name__ == "__main__":
    main()
