"""Training-throughput benchmark on the flagship HOTFormerLoc-Oxford
config (synthetic point clouds — the reference ships no data and
publishes no throughput numbers, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against BENCH_BASELINE_SUBMAPS_S, the first
recorded single-chip number for this repo (round 1 sets the bar).
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import json
import time

import numpy as np

# Recorded v5e single-chip throughput bar (best recorded number under
# the CURRENT timing methodology — see below). The reference publishes
# no throughput (SURVEY.md §6), so this repo benchmarks against its own
# bar and the metric must only go up (CLAUDE.md rule).
#
# Methodology note (round 2): round 1 recorded 11891.84 using
# `jax.block_until_ready(stats["loss"])` as the sync point. On this
# environment's tunnelled 'axon' TPU platform block_until_ready does
# NOT reliably wait for device completion (a chained 8192^3 bf16 matmul
# loop "measured" 23,474 TF/s on a 197 TF/s chip; forcing a scalar
# fetch gives a sane 154.8 TF/s = 78% of peak). All round-1 wall-clock
# numbers were therefore optimistic garbage — 11891.84 submaps/s
# implied 580 TF/s of model FLOPs on a 197 TF/s part. The bench now
# ends the timed loop with an np.asarray() fetch of the scalar loss,
# which provably waits (MFU stays < 1), and the bar below is re-based
# to the first honest measurement (2026-08-19, this file at iters=30).
# Round-5 re-base (same spirit as the round-2 timing re-base below):
# 11.95 was recorded with save_hot remat on a program whose banded-conv
# escape capacity silently overflowed on realistic clouds (dropped conv
# taps — inexact semantics, the round-5 parity regression). The bar is
# re-based to the first measurement with EXACT escape handling
# (slot-compacted escapes + occupancy-sized capacities); numbers must
# compare like-for-like under honest semantics.
BENCH_BASELINE_SUBMAPS_S = 11.70  # round-5: save_hot remat + exact escapes

# Peak dense matmul throughput per chip (bf16), for MFU accounting.
# Sources: public TPU spec sheets; "How to Scale Your Model" ch. 2.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_FLOPS.items():
        if name.lower() in kind.lower():
            return peak
    return 0.0  # unknown chip (e.g. CPU run): MFU reported as 0


def main():
    import jax
    import jax.numpy as jnp

    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig, init_train_state,
                                                make_train_step)

    B = 32                                   # per-step submaps (one chip)
    cfg = oxford_config(grad_checkpoint=True)
    model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=4)
    sched = lr_schedule(5e-4, steps_per_epoch=100, epochs=150,
                        warmup_epochs=5, milestones=[100])
    tx = make_optimizer("adam", sched, weight_decay=1e-4)

    rng = np.random.default_rng(0)
    base = rng.uniform(-0.9, 0.9, (B // 2, cfg.num_points, 3)) \
        .astype(np.float32)
    pts = np.repeat(base, 2, axis=0)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    groups = np.repeat(np.arange(B // 2), 2)
    batch = {
        "points": jnp.asarray(pts),
        "pmask": jnp.ones((B, cfg.num_points), dtype=bool),
        "positives_mask": jnp.asarray(
            (groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)),
        "negatives_mask": jnp.asarray(groups[:, None] != groups[None]),
    }

    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    # Multistage step (microbatch 8): the single-pass step at B=32
    # needs ~27G HBM and OOMs the 16G v5e chip; multistage matches the
    # production config (batch_split_size) anyway.
    step = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=4))

    # Lower+compile once so XLA's own cost analysis (FLOPs / bytes) is
    # available for roofline/MFU accounting (SURVEY.md §5). Timing uses
    # the jit fast path below, not this AOT handle.
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
    bytes_per_step = float(cost.get("bytes accessed", 0.0)) if cost else 0.0

    # Warmup (jit path; persistent cache makes this compile a hit) and
    # sync via a VALUE FETCH — see the methodology note at the top:
    # block_until_ready is not a reliable sync on the tunnelled device.
    for i in range(3):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
    float(np.asarray(stats["loss"]))

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = step(state, batch, jax.random.PRNGKey(i + 1))
    float(np.asarray(stats["loss"]))          # forces full completion
    dt = time.perf_counter() - t0
    submaps_s = B * iters / dt

    step_s = dt / iters
    peak = _chip_peak_flops()
    mfu = (flops_per_step / step_s) / peak if peak > 0 else 0.0

    print(json.dumps({
        "metric": "train_throughput_oxford_1chip",
        "value": round(submaps_s, 2),
        "unit": "submaps/s",
        "vs_baseline": round(submaps_s / BENCH_BASELINE_SUBMAPS_S, 3),
        "flops_per_step": flops_per_step,
        "bytes_per_step": bytes_per_step,
        "step_ms": round(step_s * 1e3, 3),
        "mfu": round(mfu, 4),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
