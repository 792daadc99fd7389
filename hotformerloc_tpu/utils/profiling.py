"""Profiling, tracing, and model-introspection helpers.

TPU-native replacement for the reference's observability tooling
(SURVEY.md §5): `debug_time_func`'s CUDA-event micro-benchmark
(/root/reference/misc/utils.py:336-357) becomes a block_until_ready
wall-clock timer; a `jax.profiler` trace context replaces manual event
timing for deep dives; `print_info`'s per-module parameter breakdown
(/root/reference/models/hotformerloc.py:62-83) is reproduced from the
flax param pytree, plus compiled-step FLOP/memory accounting from
XLA's own cost analysis (the roofline inputs the reference never had).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def block(tree):
    """Wait for every array in a pytree (async dispatch barrier)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def fetch_sync(tree) -> None:
    """Provably wait for device completion by FETCHING one element.

    On the tunnelled 'axon' TPU platform `block_until_ready` returns
    before the device finishes (measured: a chained 8192^3 bf16 matmul
    loop "timed" at 23,474 TF/s on a 197 TF/s chip; adding a value
    fetch gives 154.8 TF/s = 78% of peak). An XLA program's output
    buffers only materialise when the whole program completes, so
    transferring a single element of any output is a correct and cheap
    sync barrier on every platform. Use this — not `block` — to end a
    timed region.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "shape")]
    if not leaves:
        return
    leaf = min(leaves, key=lambda l: l.size)
    np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            label: Optional[str] = None, **kw) -> Dict[str, float]:
    """Time `fn(*args)` with dispatch barriers, like the reference's
    `debug_time_func` (misc/utils.py:336-357) but device-agnostic:
    warmup runs absorb compilation, then per-iteration wall clock with
    a value-fetch sync on the result (see fetch_sync — block_until_ready
    is not a reliable barrier on the tunnelled TPU platform)."""
    for _ in range(warmup):
        fetch_sync(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    stats = {"mean_s": float(np.mean(times)),
             "std_s": float(np.std(times)),
             "min_s": float(np.min(times)), "iters": iters}
    if label:
        print(f"[time] {label}: {stats['mean_s'] * 1e3:.3f} ms "
              f"± {stats['std_s'] * 1e3:.3f} (min {stats['min_s'] * 1e3:.3f})")
    return stats


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace", annotate: Optional[str] = None):
    """Capture a jax profiler trace (view with tensorboard / xprof).

    with trace("/tmp/tr"): state, _ = step(state, batch)
    """
    ctx = jax.profiler.TraceAnnotation(annotate) if annotate else None
    jax.profiler.start_trace(logdir)
    try:
        if ctx:
            with ctx:
                yield logdir
        else:
            yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"[trace] written to {logdir}")


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside an active trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def step_cost(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOP / byte-access estimates for one jitted call from XLA's cost
    analysis — the per-step roofline numerator. fn must be jittable."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0] if cost else {}
    out = {}
    for k in ("flops", "bytes accessed", "transcendentals"):
        if cost and k in cost:
            out[k.replace(" ", "_")] = float(cost[k])
    return out


def _group_params(params, depth: int = 1) -> Dict[str, int]:
    """Aggregate param counts by the first `depth` path components."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: Dict[str, int] = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", str(p)))
                for p in path[:depth]]
        g = "/".join(str(k) for k in keys) or "<root>"
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        groups[g] = groups.get(g, 0) + n
    return dict(sorted(groups.items(), key=lambda kv: -kv[1]))


def print_info(model_name: str, params, depth: int = 1,
               step_fn: Optional[Callable] = None,
               example_args: tuple = ()) -> Dict:
    """Model summary ~ reference `print_info`
    (models/hotformerloc.py:62-83): total + per-module param counts,
    and — beyond the reference — XLA FLOPs/bytes for one step when a
    jittable fn + example args are given."""
    groups = _group_params(params, depth)
    total = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"Model name: {model_name}")
    print(f"Total parameters: {total:,}")
    for g, n in groups.items():
        print(f"  {g:<40s} {n:>12,}  ({100.0 * n / max(total, 1):5.1f}%)")
    info = {"total_params": int(total), "groups": groups}
    if step_fn is not None:
        cost = step_cost(step_fn, *example_args)
        for k, v in cost.items():
            print(f"  {k}: {v:.3e}")
        info["cost"] = cost
    return info
