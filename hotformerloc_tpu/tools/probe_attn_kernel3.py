"""Bisect the remaining hosa-case compiler crash of the v3 fused
attention kernel: vary (H, C, G, T) from the working octf point
(H=8, C=128, G=0, T=48) toward the failing hosa point
(H=16, C=256, G=1, T=49).

Run: python -m hotformerloc_tpu.tools.probe_attn_kernel3
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from hotformerloc_tpu.ops.pallas.window_attn import fused_window_attention
from hotformerloc_tpu.utils.profiling import fetch_sync

BW, K = 704, 48
BND = 38


def case(name, H, C, G, wt=8, bwd=False):
    T = K + G
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (BW, T, C)), jnp.bfloat16)
    xyz = jnp.asarray(rng.integers(0, 128, (BW, 3, K)), jnp.int32)
    mask = jnp.ones((BW, T), jnp.int32)
    tab = jnp.asarray(rng.normal(0, 0.1, (3 * (2 * BND + 1), H)),
                      jnp.float32)
    try:
        if bwd:
            def loss(q, k, v, tab):
                return jnp.sum(fused_window_attention(
                    q, k, v, xyz, mask, tab, H, G, BND, True, wt, False,
                    128).astype(jnp.float32) ** 2)
            out = jax.jit(jax.grad(loss, argnums=(0, 3)))(q, k, v, tab)
        else:
            out = jax.jit(lambda q, k, v, tab: fused_window_attention(
                q, k, v, xyz, mask, tab, H, G, BND, True, wt, False,
                128))(q, k, v, tab)
        fetch_sync(jax.tree_util.tree_leaves(out)[0])
        print(json.dumps({"case": name, "ok": True}), flush=True)
        return True
    except Exception as e:
        print(json.dumps({"case": name, "ok": False,
                          "err": str(e)[:110]}), flush=True)
        return False


def main():
    case("base_H8_C128_G0", 8, 128, 0)
    case("G1_H8_C128", 8, 128, 1)
    case("H16_C256_G0", 16, 256, 0)
    case("H16_C128_G0", 16, 128, 0)
    case("H8_C256_G0", 8, 256, 0)
    case("H16_C256_G1", 16, 256, 1)
    case("H16_C256_G1_wt16", 16, 256, 1, wt=16)
    case("bwd_H8_C128_G0", 8, 128, 0, bwd=True)
    case("bwd_H16_C256_G1", 16, 256, 1, bwd=True)


if __name__ == "__main__":
    main()
