"""Bisect which construct of the v2 fused attention kernel crashes the
remote Mosaic compiler (pallas_ab: wt8/16 fail with an opaque HTTP 500).

Variants build up the forward kernel piece by piece at the hosa shape.
Run on the real chip: python -m hotformerloc_tpu.tools.probe_attn_kernel
"""
from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotformerloc_tpu.utils.profiling import fetch_sync

BW, T, C, H, G = 704, 49, 256, 16, 1
K = T - G
hd = C // H
BND = 38
NUM = 2 * BND + 1
R = 3 * NUM
WT = 8
MASK_VALUE = -1e9


def _specs():
    tile3 = pl.BlockSpec((WT, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return [
        tile3, tile3, tile3,
        pl.BlockSpec((WT, 3, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((WT, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ], tile3


def bias_full_r(xyz_ref, table_ref, cdt):
    col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, R), 3)
    oh = None
    for a in range(3):
        c = xyz_ref[:, a, :]
        d = c[:, :, None] - c[:, None, :]
        idx = jnp.clip(d, -BND, BND) + BND + a * NUM
        part = (col == idx[..., None]).astype(cdt)
        oh = part if oh is None else oh + part
    return jax.lax.dot_general(oh, table_ref[:].astype(cdt),
                               (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def bias_sliced(xyz_ref, table_ref, cdt):
    bias = None
    for a in range(3):
        c = xyz_ref[:, a, :]
        d = c[:, :, None] - c[:, None, :]
        idx = jnp.clip(d, -BND, BND) + BND
        col = jax.lax.broadcasted_iota(jnp.int32, (WT, K, K, NUM), 3)
        oh = (col == idx[..., None]).astype(cdt)
        tab_a = table_ref[a * NUM:(a + 1) * NUM, :].astype(cdt)
        part = jax.lax.dot_general(oh, tab_a, (((3,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        bias = part if bias is None else bias + part
    return bias


def make_kernel(variant: str):
    def kern(q_ref, k_ref, v_ref, xyz_ref, mask_ref, table_ref, o_ref):
        cdt = q_ref.dtype
        scale = hd ** -0.5
        mask_add = jnp.where(mask_ref[:] > 0, 0.0, MASK_VALUE)[:, None, :]
        bias4 = None
        if variant in ("full_r", "sliced", "full_r_nopad"):
            f = bias_sliced if variant == "sliced" else bias_full_r
            bias4 = f(xyz_ref, table_ref, cdt)
        nheads = H if variant != "one_head" else 1
        for h in range(nheads):
            qh = q_ref[:, :, h * hd:(h + 1) * hd]
            kh = k_ref[:, :, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            if bias4 is not None:
                bh = bias4[:, :, :, h]
                if variant != "full_r_nopad":
                    bh = jnp.pad(bh, ((0, 0), (G, 0), (G, 0)))
                    logits = logits + bh
                else:
                    logits = logits + jnp.pad(
                        bh, ((0, 0), (G, 0), (G, 0)))
            attn = jax.nn.softmax(logits + mask_add, axis=-1).astype(cdt)
            vh = v_ref[:, :, h * hd:(h + 1) * hd]
            out = jax.lax.dot_general(
                attn, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, h * hd:(h + 1) * hd] = out.astype(cdt)
        if variant == "one_head":
            o_ref[:, :, hd:] = jnp.zeros((WT, T, C - hd), cdt)

    return kern


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    xyz = jnp.asarray(rng.integers(0, 128, (BW, 3, K)), jnp.int32)
    mask = jnp.ones((BW, T), jnp.int32)
    tab = jnp.asarray(rng.normal(0, 0.1, (R, H)), jnp.float32)

    in_specs, tile3 = _specs()
    for variant in ("no_rpe", "one_head", "full_r", "full_r_nopad",
                    "sliced"):
        try:
            f = pl.pallas_call(
                make_kernel(variant),
                grid=(BW // WT,),
                in_specs=in_specs,
                out_specs=tile3,
                out_shape=jax.ShapeDtypeStruct((BW, T, C), jnp.bfloat16),
            )
            out = jax.jit(f)(q, k, v, xyz, mask, tab)
            fetch_sync(out)
            print(json.dumps({"variant": variant, "ok": True}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant, "ok": False,
                              "err": str(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
