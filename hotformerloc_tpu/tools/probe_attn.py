"""Third-stage Mosaic probes for the window-attention kernel rewrite.

Covers exactly the constructs the v2 fused kernel needs that earlier
probes left uncertain:
  * transposed one-hot dot: (H, num) @ (WT, K, K, num) -> (H, WT, K, K)
  * bias4 @ e_h matvec: (WT, K, K, H) . (H,) -> (WT, K, K)
  * minor-lane slice-and-drop: bias4[..., h] -> (WT, K, K)
  * moveaxis (WT, K, K, H) -> (WT, H, K, K)
  * merge-major reshape (WT, K, K) -> (WT*K, K)
  * batched matvec: (M, K) x (M, K, num) -> (M, num)
  * major-axis sum reduce: (M, num) -> (1, num)
  * dense 3-D depthwise conv alternatives for the CPE dwconv at coarse
    depths: lax.conv_general_dilated vs 27 shifted adds (timed).

Run on the real chip: python -m hotformerloc_tpu.tools.probe_attn
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

WT, K, H, NUM = 8, 48, 16, 77


def _try(name, build, check=None, iters=20):
    try:
        fn = jax.jit(build())
        out = fn()
        fetch_sync(out)
        md = None
        if check is not None:
            md = round(float(np.abs(np.asarray(out, np.float32)
                                    - check).max()), 5)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fetch_sync(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"probe": name, "ok": True, "ms": round(ms, 4),
                          "maxdiff": md}), flush=True)
        return True
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e)[:160]}), flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    ia = jnp.asarray(rng.integers(0, NUM, (WT, K, K)), jnp.int32)
    tabT = jnp.asarray(rng.normal(0, 1, (H, NUM)), jnp.float32)
    bias4 = jnp.asarray(rng.normal(0, 1, (WT, K, K, H)), jnp.float32)
    dl2 = jnp.asarray(rng.normal(0, 1, (WT * K, K)), jnp.float32)
    oh3 = jnp.asarray(rng.normal(0, 1, (WT * K, K, NUM)), jnp.bfloat16)

    # 1. transposed one-hot dot -> (H, WT, K, K)
    def k_tdot(i_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, NUM), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            t_ref[:].astype(jnp.bfloat16), oh, (((1,), (3,)), ((), ())),
            preferred_element_type=jnp.float32)

    def b1():
        f = pl.pallas_call(k_tdot,
                           out_shape=jax.ShapeDtypeStruct((H, WT, K, K),
                                                          jnp.float32),
                           in_specs=[vm(), vm()], out_specs=vm())
        return lambda: f(ia, tabT)

    want1 = np.moveaxis(np.asarray(tabT)[:, np.asarray(ia)], 0, 0)
    _try("tdot_H_WT_K_K", b1, want1)

    # 2. bias4 . e_h  -> (WT, K, K)
    def k_matvec(b_ref, e_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            b_ref[:], e_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    e3 = jnp.zeros((H,), jnp.float32).at[3].set(1.0)

    def b2():
        f = pl.pallas_call(k_matvec,
                           out_shape=jax.ShapeDtypeStruct((WT, K, K),
                                                          jnp.float32),
                           in_specs=[vm(), vm()], out_specs=vm())
        return lambda: f(bias4, e3)

    _try("bias4_matvec_eh", b2, np.asarray(bias4)[..., 3])

    # 3. minor-lane slice-and-drop
    def k_slice(b_ref, o_ref):
        o_ref[:] = b_ref[:, :, :, 3]

    def b3():
        f = pl.pallas_call(k_slice,
                           out_shape=jax.ShapeDtypeStruct((WT, K, K),
                                                          jnp.float32),
                           in_specs=[vm()], out_specs=vm())
        return lambda: f(bias4)

    _try("minor_lane_slice_drop", b3, np.asarray(bias4)[..., 3])

    # 4. moveaxis minor -> second
    def k_move(b_ref, o_ref):
        o_ref[:] = jnp.moveaxis(b_ref[:], 3, 1)

    def b4():
        f = pl.pallas_call(k_move,
                           out_shape=jax.ShapeDtypeStruct((WT, H, K, K),
                                                          jnp.float32),
                           in_specs=[vm()], out_specs=vm())
        return lambda: f(bias4)

    _try("moveaxis_minor_to_dim1", b4, np.moveaxis(np.asarray(bias4), 3, 1))

    # 5. merge-major reshape
    def k_merge(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(WT * K, K).astype(jnp.float32)

    def b5():
        f = pl.pallas_call(k_merge,
                           out_shape=jax.ShapeDtypeStruct((WT * K, K),
                                                          jnp.float32),
                           in_specs=[vm()], out_specs=vm())
        return lambda: f(ia)

    _try("merge_major_reshape", b5,
         np.asarray(ia).reshape(WT * K, K).astype(np.float32))

    # 6. batched matvec (M,K)x(M,K,NUM)->(M,NUM)
    def k_bmv(d_ref, o_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            d_ref[:], o_ref[:].astype(jnp.float32),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def b6():
        f = pl.pallas_call(k_bmv,
                           out_shape=jax.ShapeDtypeStruct((WT * K, NUM),
                                                          jnp.float32),
                           in_specs=[vm(), vm()], out_specs=vm())
        return lambda: f(dl2, oh3)

    want6 = np.einsum("ms,msj->mj", np.asarray(dl2),
                      np.asarray(oh3, np.float32))
    _try("batched_matvec", b6, want6)

    # 7. major-axis reduce (M, NUM) -> (1, NUM)
    def k_red(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)

    def b7():
        f = pl.pallas_call(k_red,
                           out_shape=jax.ShapeDtypeStruct((1, NUM),
                                                          jnp.float32),
                           in_specs=[vm()], out_specs=vm())
        return lambda: f(dl2[:, :NUM])

    _try("major_axis_reduce", b7,
         np.asarray(dl2)[:, :NUM].sum(0, keepdims=True))

    # --- dense dwconv candidates (XLA level, depth 4: 16^3 grid) -------
    B, C = 8, 256
    for D in (16, 32):
        dense = jnp.asarray(rng.normal(0, 1, (B, D, D, D, C)), jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, C)), jnp.bfloat16)

        def conv_dw(x, w):
            return jax.lax.conv_general_dilated(
                x, w.reshape(3, 3, 3, 1, C), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=C)

        def shift_dw(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros_like(x, dtype=jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        acc += (xp[:, dz:dz + D, dy:dy + D, dx:dx + D, :]
                                .astype(jnp.float32) * w[dz, dy, dx])
            return acc.astype(x.dtype)

        want = None
        for nm, fn in (("conv3d_dw", conv_dw), ("shift27_dw", shift_dw)):
            def b(fn=fn):
                jf = jax.jit(fn)
                return lambda: jf(dense, w3)
            try:
                out = np.asarray(jax.jit(fn)(dense, w3), np.float32)
                if want is None:
                    want = out
                _try(f"{nm}_D{D}", b, want, iters=10)
            except Exception as e:
                print(json.dumps({"probe": f"{nm}_D{D}", "ok": False,
                                  "err": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
