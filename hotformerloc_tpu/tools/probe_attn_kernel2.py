"""Stage-2 bisect of the fused-attention compiler crash: bias-only
kernels varying (idx source, grid presence, one-hot dtype, T vs K
output). Run: python -m hotformerloc_tpu.tools.probe_attn_kernel2"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotformerloc_tpu.utils.profiling import fetch_sync

BW, K, H = 704, 48, 16
BND = 38
NUM = 2 * BND + 1
R = 3 * NUM
WT = 8


def run(name, kern, in_arrays, in_specs, out_shape, out_spec, grid=None):
    try:
        kwargs = dict(in_specs=in_specs, out_specs=out_spec,
                      out_shape=out_shape)
        if grid is not None:
            kwargs["grid"] = grid
        out = jax.jit(pl.pallas_call(kern, **kwargs))(*in_arrays)
        fetch_sync(out)
        print(json.dumps({"probe": name, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": str(e)[:130]}), flush=True)


def main():
    rng = np.random.default_rng(0)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    xyz = jnp.asarray(rng.integers(0, 128, (BW, 3, K)), jnp.int32)
    ia = jnp.asarray(rng.integers(0, R, (WT, K, K)), jnp.int32)
    tab = jnp.asarray(rng.normal(0, 0.1, (R, H)), jnp.float32)

    # A. no grid, idx input direct (the passing mosaic_probe construct,
    #    repeated here as the control)
    def kA(i_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run("A_control_nogrid", kA, (ia, tab), [vm, vm],
        jax.ShapeDtypeStruct((WT, K, K, H), jnp.float32), vm)

    # B. same but idx computed from an xyz tile (no grid)
    xyz_t = xyz[:WT]

    def kB(x_ref, t_ref, o_ref):
        c = x_ref[:, 0, :]
        d = c[:, :, None] - c[:, None, :]
        idx = jnp.clip(d, -BND, BND) + BND
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == idx[..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run("B_idx_from_xyz_nogrid", kB, (xyz_t, tab), [vm, vm],
        jax.ShapeDtypeStruct((WT, K, K, H), jnp.float32), vm)

    # C. control construct + grid over BW tiles
    iag = jnp.asarray(rng.integers(0, R, (BW, K, K)), jnp.int32)

    def kC(i_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run("C_control_grid", kC, (iag, tab),
        [pl.BlockSpec((WT, K, K), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((R, H), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        jax.ShapeDtypeStruct((BW, K, K, H), jnp.float32),
        pl.BlockSpec((WT, K, K, H), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM), grid=(BW // WT,))

    # D. bias4 + per-head slice store, no grid (minor slice of 4-D temp)
    def kD(i_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = (col == i_ref[:][..., None]).astype(jnp.bfloat16)
        b4 = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = jnp.zeros((WT, K, K), jnp.float32)
        for h in range(H):
            acc = acc + b4[:, :, :, h]
        o_ref[:] = acc

    run("D_bias_headslice_nogrid", kD, (ia, tab), [vm, vm],
        jax.ShapeDtypeStruct((WT, K, K), jnp.float32), vm)

    # E. 3-axis accumulated one-hot (sum of three compares) + dot, no grid
    def kE(x_ref, t_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
        oh = None
        for a in range(3):
            c = x_ref[:, a, :]
            d = c[:, :, None] - c[:, None, :]
            idx = jnp.clip(d, -BND, BND) + BND + a * NUM
            part = (col == idx[..., None]).astype(jnp.bfloat16)
            oh = part if oh is None else oh + part
        o_ref[:] = jax.lax.dot_general(
            oh, t_ref[:].astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run("E_3axis_oh_nogrid", kE, (xyz_t, tab), [vm, vm],
        jax.ShapeDtypeStruct((WT, K, K, H), jnp.float32), vm)


if __name__ == "__main__":
    main()
