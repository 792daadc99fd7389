"""On-chip A/B of octree-dwconv gather strategies.

docs/PROFILE.md shows the CPE depthwise-conv neighbour gathers as the
dominant train-step cost after the RPE scatter fix: a flat XLA row
gather of (B*N*27, C) runs ~25x below HBM bandwidth on v5e. This tool
times every candidate reformulation at the exact hosa0 shape
(B=8, N=4224, C=256, K=27) with REAL neighbour tables (z-order locality
matters — random indices are the pathological case), checks each
against the reference implementation, and prints one JSON line per
variant. The winner becomes ops/conv.py's formulation / the Pallas
dwconv kernel (SURVEY.md §7-3; reference CUDA analogue
/root/reference/libs/dwconv/csrc/dwconv.cu:24-42).

Variants:
  flat_gather      current ops/conv.py row gather (baseline)
  dw_current       full current dwconv forward
  sorted_gather    same multiset of indices, sorted — is XLA's gather
                   speed index-locality dependent?
  row_size x4/x16  gather fewer, fatter rows — does throughput scale
                   with row size (is the cost per-index)?
  pl_take          Pallas kernel: per-tap take_along_axis on the
                   sublane dim with x resident in VMEM
  pl_dw            Pallas kernel: full dwconv, 27 in-kernel taps
  onehot_window    MXU formulation: per 128-node tile, one-hot matmul
                   over a +-R banded halo (escape fraction printed; only
                   viable if ~0)

Run on the real chip:  python -m hotformerloc_tpu.tools.gather_bench
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hotformerloc_tpu.utils.profiling import fetch_sync

R_ITERS = 20


def _time_ms(fn, *args, iters: int = 3) -> float:
    """Best-of wall clock of R_ITERS serially-dependent calls in one jit."""

    @jax.jit
    def prog(x0, *rest):
        def body(i, acc):
            out = fn(acc, *rest)
            return acc + out.reshape(acc.shape).astype(acc.dtype) * 1e-6

        return jax.lax.fori_loop(0, R_ITERS, body, x0)

    fetch_sync(prog(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_sync(prog(*args))
        best = min(best, time.perf_counter() - t0)
    return best / R_ITERS * 1e3


def real_tables(B: int = 8, num_points: int = 4096, depth_use: int = 6):
    """Neighbour tables from an actual on-device plan build on synthetic
    clouds (same generator as bench.py)."""
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.ops.plan import build_plan

    cfg = oxford_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (B, num_points, 3)).astype(np.float32)
    octree = build_batched_octree(jnp.asarray(pts),
                                  jnp.ones((B, num_points), bool),
                                  cfg.octree_depth, cfg.min_depth,
                                  cfg.resolve_capacities())
    plan = build_plan(octree)
    lev = octree.level(depth_use)
    neigh = np.asarray(plan.neighs[lev])
    return neigh


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    B, C, K = 8, 256, 27
    neigh = real_tables(B)
    N = neigh.shape[1]
    print(f"shape: B={B} N={N} C={C} K={K}  "
          f"(valid taps: {(neigh >= 0).mean():.3f})")

    # Locality census: |neigh - node| distribution over valid taps.
    node = np.arange(N)[None, :, None]
    off = np.abs(neigh - node)
    valid = neigh >= 0
    stats = {}
    for w in (48, 128, 256, 512, 1024, 2048):
        stats[f"<= {w}"] = round(float((off[valid] <= w).mean()), 4)
    print("locality:", json.dumps(stats))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    nj = jnp.asarray(neigh)
    w = jnp.asarray(rng.normal(0, 0.2, (K, C)), jnp.bfloat16)

    from hotformerloc_tpu.ops.conv import _dwconv_fwd_impl, _gather_rows

    ref = np.asarray(_dwconv_fwd_impl(x, nj, w), np.float32)

    results = {}

    def record(name, ms, out=None, extra=None):
        ent = {"ms": round(ms, 3)}
        if out is not None:
            ent["maxdiff"] = round(
                float(np.abs(np.asarray(out, np.float32) - ref).max()), 5)
        if extra:
            ent.update(extra)
        results[name] = ent
        print(json.dumps({name: ent}), flush=True)

    # 1. baseline flat row gather (output (B, N, K, C) materialised)
    def flat_gather(xx, nn):
        return _gather_rows(xx, nn).reshape(B, N, K * C)[:, :, :C]

    record("flat_gather", _time_ms(flat_gather, x, nj))

    # 2. current dwconv forward
    record("dw_current", _time_ms(_dwconv_fwd_impl, x, nj, w),
           _dwconv_fwd_impl(x, nj, w))

    # 3. sorted indices — locality dependence of the XLA gather
    flat_idx = np.where(neigh >= 0, neigh, 0) + node * 0  # (B, N, K)
    srt = np.sort(flat_idx.reshape(B, -1), axis=1).reshape(B, N, K)
    nj_sorted = jnp.asarray(srt)

    record("sorted_gather", _time_ms(flat_gather, x, nj_sorted))

    # 4. row-size scaling: gather N*K/f rows of f*C from a reshaped x
    for f in (4, 16):
        xf = x.reshape(B, N // f, f * C)
        idxf = jnp.asarray(
            rng.integers(0, N // f, (B, N * K // f)), jnp.int32)

        def fat_gather(xx, ii, f=f):
            out = _gather_rows(xx, ii)
            return out.reshape(B, N, K * C)[:, :, :C]

        record(f"rowsize_x{f}", _time_ms(fat_gather, xf, idxf))

    # 5/6. Pallas in-kernel gathers, x resident in VMEM
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_take(x_ref, n_ref, o_ref):
        xx = x_ref[0]
        nk = jnp.maximum(n_ref[0], 0)                    # (N, K)
        g = jnp.take_along_axis(
            xx, jnp.broadcast_to(nk[:, 0][:, None], (N, C)), axis=0)
        o_ref[0] = g

    def k_dw(x_ref, n_ref, w_ref, o_ref):
        xx = x_ref[0]
        nn = n_ref[0]
        ww = w_ref[:]
        acc = jnp.zeros((N, C), jnp.float32)
        for k in range(K):
            nk = jnp.maximum(nn[:, k], 0)
            g = jnp.take_along_axis(
                xx, jnp.broadcast_to(nk[:, None], (N, C)), axis=0)
            g = jnp.where((nn[:, k] >= 0)[:, None], g, 0)
            acc = acc + g.astype(jnp.float32) * ww[k][None, :]
        o_ref[0] = acc.astype(o_ref.dtype)

    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def pl_take(xx, nn):
        return pl.pallas_call(
            k_take, grid=(B,),
            in_specs=[vm((1, N, C), lambda b: (b, 0, 0)),
                      vm((1, N, K), lambda b: (b, 0, 0))],
            out_specs=vm((1, N, C), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), xx.dtype),
        )(xx, nn)

    def pl_dw(xx, nn, ww):
        return pl.pallas_call(
            k_dw, grid=(B,),
            in_specs=[vm((1, N, C), lambda b: (b, 0, 0)),
                      vm((1, N, K), lambda b: (b, 0, 0)),
                      vm((K, C), lambda b: (0, 0))],
            out_specs=vm((1, N, C), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), xx.dtype),
        )(xx, nn, ww)

    for name, fn, args, check in (
            ("pl_take", pl_take, (x, nj), None),
            ("pl_dw", pl_dw, (x, nj, w), "yes")):
        try:
            out = jax.jit(fn)(*args)
            fetch_sync(out)
            ms = _time_ms(fn, *args)
            record(name, ms, out if check else None)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(json.dumps({name: results[name]}), flush=True)

    # 7. banded one-hot MXU formulation (viability + speed)
    S, HR = 128, 256             # tile size, halo radius
    W = S + 2 * HR
    tiles = N // S
    base = (np.arange(tiles) * S - HR)[None, :, None, None]   # tile start
    loc = neigh.reshape(B, tiles, S, K) - base
    esc = ((loc < 0) | (loc >= W)) & (neigh.reshape(B, tiles, S, K) >= 0)
    esc_frac = float(esc.mean())
    loc = np.where((loc >= 0) & (loc < W) &
                   (neigh.reshape(B, tiles, S, K) >= 0), loc, W)
    locj = jnp.asarray(loc, jnp.int32)                        # (B,T,S,K)

    def onehot_window(xx, ll, ww):
        # halo tiles: (B, T, W, C) via static strided slices (cheap)
        xp = jnp.pad(xx, ((0, 0), (HR, HR), (0, 0)))
        ht = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, t * S, W, 1)
                        for t in range(tiles)], 1)            # (B,T,W,C)
        oh = jax.nn.one_hot(ll, W, dtype=xx.dtype)            # (B,T,S,K,W)
        g = jnp.einsum("btskw,btwc->btskc", oh, ht,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("btskc,kc->btsc", g.astype(xx.dtype), ww,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, N, C).astype(xx.dtype)

    try:
        out = jax.jit(onehot_window)(x, locj, w)
        fetch_sync(out)
        ms = _time_ms(onehot_window, x, locj, w)
        # correctness only meaningful where no escapes
        record("onehot_window", ms, None, {"esc_frac": round(esc_frac, 4)})
    except Exception as e:
        print(json.dumps({"onehot_window": {"error": str(e)[:200]}}),
              flush=True)

    with open("docs/GATHER_AB.json", "w") as f:
        json.dump({"device": dev.device_kind, "B": B, "N": N, "C": C,
                   "K": K, "locality": stats, "results": results}, f,
                  indent=1)
    print("wrote docs/GATHER_AB.json")


if __name__ == "__main__":
    main()
