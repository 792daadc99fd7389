"""Probe: which dynamic-gather formulations does Mosaic accept in a TPU
Pallas kernel, and how fast are they vs the XLA flat gather?

Feeds the dwconv kernel design (ops/pallas/dwconv.py): the hot CPE op
gathers (B, N, 27) neighbour rows of (C,) features; if the whole
per-sample feature array fits VMEM (N*C*2B ~ 2.2 MB at Oxford scale),
an in-kernel gather avoids 27x HBM patch materialisation entirely.

Timing: the tunnelled chip has ~1.4 ms dispatch latency per call, so
every variant is iterated R times INSIDE one jit program with a serial
data dependence (acc feeds the next input) and wall-clock ends with a
value fetch (utils/profiling.fetch_sync; block_until_ready lies here).

Run on the real chip: python -m hotformerloc_tpu.tools.probe_vmem_gather
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hotformerloc_tpu.utils.profiling import fetch_sync

R = 30  # in-program iterations


def _time_looped(one_call, x, *rest, iters=3):
    """Time R serialised invocations of one_call inside a single jit."""

    @jax.jit
    def prog(x0):
        def body(i, acc):
            out = one_call(acc, *rest)
            # serialise: fold output back into the input's dtype/shape
            return acc + out[: acc.shape[0], : acc.shape[1]].astype(acc.dtype) * 1e-6

        return jax.lax.fori_loop(0, R, body, x0)

    fetch_sync(prog(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_sync(prog(x))
        best = min(best, time.perf_counter() - t0)
    return best / R * 1e3


def k_take_bcast(x_ref, idx_ref, o_ref):
    # row gather with FULL-shape indices (Mosaic dynamic_gather wants
    # idx shape == output shape)
    N, C = x_ref.shape
    idx = jnp.broadcast_to(idx_ref[:][:, None], (N, C))
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)


def k_dwconv_take(x_ref, neigh_ref, w_ref, o_ref):
    # full dwconv tile: out[n,c] = sum_k w[k,c] * x[neigh[n,k], c]
    x = x_ref[:]
    neigh = neigh_ref[:]                                  # (N, 27)
    w = w_ref[:]
    N, C = x.shape
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for k in range(neigh.shape[1]):
        nk = jnp.maximum(neigh[:, k], 0)
        g = jnp.take_along_axis(
            x, jnp.broadcast_to(nk[:, None], (N, C)), axis=0)
        g = jnp.where((neigh[:, k] >= 0)[:, None], g, 0)
        acc = acc + g.astype(jnp.float32) * w[k][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def main():
    N, C, K = 4224, 256, 27
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, (N,)), jnp.int32)
    neigh = jnp.asarray(rng.integers(-1, N, (N, K)), jnp.int32)
    w = jnp.asarray(rng.normal(0, 1, (K, C)), jnp.bfloat16)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def pcall(kern, nargs, *a):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
            in_specs=[vm] * nargs,
            out_specs=vm,
        )(*a)

    cases = [
        ("pl_take_bcast", lambda xx, ii: pcall(k_take_bcast, 2, xx, ii),
         (idx,)),
        ("pl_dwconv", lambda xx, nn, ww: pcall(k_dwconv_take, 3, xx, nn, ww),
         (neigh, w)),
    ]
    for name, f, rest in cases:
        try:
            out = jax.jit(f)(x, *rest)
            fetch_sync(out)
            ms = _time_looped(f, x, *rest)
            print(f"{name:16s} OK   {ms:8.3f} ms/call")
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name:16s} FAIL {msg}")

    # XLA baselines on identical shapes
    def xla_gather(xx, ii):
        return jnp.take(xx, ii, axis=0)

    def xla_dwconv(xx, nn, ww):
        g = jnp.take(xx, jnp.maximum(nn, 0).reshape(-1), axis=0)
        g = jnp.where((nn >= 0).reshape(-1)[:, None], g, 0)
        return jnp.einsum("nkc,kc->nc", g.reshape(N, K, C), ww)

    print(f"{'xla_gather':16s} OK   "
          f"{_time_looped(xla_gather, x, idx):8.3f} ms/call")
    print(f"{'xla_dwconv':16s} OK   "
          f"{_time_looped(xla_dwconv, x, neigh, w):8.3f} ms/call")


if __name__ == "__main__":
    main()
