"""Probe which Pallas/Mosaic constructs the REAL TPU compiler accepts.

Interpret mode (CPU tests) accepts everything; Mosaic rejects >1 batch
dim in tpu.matmul, many minor-dim reshapes, etc. (CLAUDE.md). Each probe
compiles + runs one tiny kernel using a single construct the fused
window-attention rewrite wants, and prints ok/error — run this BEFORE
committing to a kernel design.

Usage: python -m hotformerloc_tpu.tools.mosaic_probe
"""
from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def main():
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


if __name__ == "__main__":
    main()
