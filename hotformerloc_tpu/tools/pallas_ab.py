"""On-chip A/B: fused Pallas window attention vs the XLA einsum path.

Round-1 review item #2: the Pallas kernel (ops/pallas/window_attn.py)
shipped dormant with no on-chip evidence. This tool times the full
WindowAttention module (qkv/proj included, identical on both paths) at
the shapes the Oxford train step actually runs, forward and
forward+backward, across window_tile candidates, and writes the verdict
to docs/PALLAS_AB.json. bench.py / the model config default
(`use_pallas_attn`) must be set from this file's result.

Shapes (Oxford, microbatch 8 of the multistage step):
  * H-OSA/HAT: (B*W=704, T=49, C=256, H=16), G=1 relay slot, dilation 1
  * OctFormer: (B*W=704, T=48, C=128, H=8),  G=0, dilation 1 and 4
Run: python -m hotformerloc_tpu.tools.pallas_ab
"""
from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters: int = 30) -> float:
    # Sync via a value fetch: block_until_ready is not a reliable
    # barrier on the tunnelled TPU platform (see utils/profiling.py
    # fetch_sync). Programs execute in dispatch order on one chip, so
    # one fetch at the end waits for the whole loop.
    from hotformerloc_tpu.utils.profiling import fetch_sync
    out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / iters * 1e3          # ms


def bench_case(name: str, BW: int, K: int, G: int, C: int, H: int,
               dilation: int, depth: int = 7, iters: int = 30,
               combos=((16, 1), (8, 2), (16, 2)), seed: int = 0):
    """combos: (window_tile, pack) pairs for the Pallas path; pack
    fuses that many windows per kernel row block (r5 packing —
    ops/pallas/window_attn.py)."""
    from hotformerloc_tpu.models.attention import WindowAttention

    T = K + G
    B, W = 8, BW // 8
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, W, T, C)), jnp.bfloat16)
    # realistic validity: full windows except a ragged tail per sample
    valid = np.ones((B, W, T), bool)
    tail = rng.integers(1, T, B)
    for b in range(B):
        valid[b, -6:, -tail[b]:] = False
    key_mask = jnp.asarray(valid)
    xyz = jnp.asarray(rng.integers(0, 2 ** depth, (B, W, K, 3)), jnp.int32)

    import hotformerloc_tpu.models.attention as attn_mod

    # Parameters are identical on both paths; init once via XLA so a
    # Mosaic rejection in the Pallas path is caught per-case below.
    ref_mod = WindowAttention(C, H, K, dilation, G, True, 0.0, 0.0, True,
                              use_pallas=False, coord_range=2 ** depth,
                              dtype=jnp.bfloat16)
    params = ref_mod.init(jax.random.PRNGKey(0), x, key_mask, xyz)

    results = {}
    ref_out = None
    for mode, wt, pk in ([("xla", None, None)]
                         + [("pallas", t, p) for t, p in combos]):
        if wt is not None and (BW % (wt * pk) != 0
                               or pk * T > 128):
            continue
        key = f"{mode}_wt{wt}_p{pk}" if wt else mode
        mod = WindowAttention(C, H, K, dilation, G, True, 0.0, 0.0, True,
                              use_pallas=(mode == "pallas"),
                              coord_range=2 ** depth,
                              dtype=jnp.bfloat16)
        attn_mod._FORCED_WINDOW_TILE = wt
        attn_mod._FORCED_PACK = pk

        fwd = jax.jit(lambda p, x_: mod.apply(p, x_, key_mask, xyz))

        def loss(p, x_):
            return jnp.sum(mod.apply(p, x_, key_mask, xyz)
                           .astype(jnp.float32) ** 2)
        fb = jax.jit(jax.grad(loss, argnums=(0, 1)))

        try:
            # The tunnelled remote-compile service crashes transiently
            # (HTTP 500, reproducibly compiles on retry) — retry those.
            last = None
            for _ in range(3):
                try:
                    fwd_ms = _time(fwd, params, x, iters=iters)
                    bwd_ms = _time(fb, params, x, iters=iters)
                    out = np.asarray(fwd(params, x), np.float32)
                    last = None
                    break
                except Exception as e:
                    last = e
                    if "remote_compile" not in str(e):
                        break
            if last is not None:
                raise last
        except Exception as e:                        # Mosaic rejection etc.
            results[key] = {"error": str(e)[:300]}
            attn_mod._FORCED_WINDOW_TILE = None
            attn_mod._FORCED_PACK = None
            continue
        finally:
            attn_mod._FORCED_WINDOW_TILE = None
            attn_mod._FORCED_PACK = None
        if ref_out is None:
            ref_out = out
            maxdiff = 0.0
        else:
            # valid query rows only: the packed kernel zeroes
            # invalid-row outputs exactly, the XLA path leaves them
            # as (masked-downstream) garbage
            vm = np.asarray(valid)[..., None]
            maxdiff = float((np.abs(out - ref_out) * vm).max())
        results[key] = {"fwd_ms": round(fwd_ms, 4),
                        "fwd_bwd_ms": round(bwd_ms, 4),
                        "maxdiff_vs_xla": round(maxdiff, 6)}
    return {"case": name, "BW": BW, "T": T, "C": C, "H": H,
            "dilation": dilation, **results}


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    cases = [
        bench_case("hosa_hat", BW=704, K=48, G=1, C=256, H=16, dilation=1),
        bench_case("octf_d1", BW=704, K=48, G=0, C=128, H=8, dilation=1),
        bench_case("octf_d4", BW=704, K=48, G=0, C=128, H=8, dilation=4),
    ]
    out = {"device": dev.device_kind, "cases": cases}
    path = "docs/PALLAS_AB.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    for c in cases:
        print(json.dumps(c))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
