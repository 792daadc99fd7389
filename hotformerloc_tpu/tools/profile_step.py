"""Profile the flagship train step and emit a roofline report.

TPU-native observability (SURVEY.md §5: "jax profiler traces +
per-kernel roofline accounting", replacing the reference's
`debug_time_func` CUDA-event timer, /root/reference/misc/utils.py:336-357):

1. compiles the benchmark train step (same shapes as bench.py),
2. records XLA's own cost analysis (FLOPs / bytes accessed),
3. captures a `jax.profiler` trace of a few hot steps,
4. parses the xplane protos into a per-HLO-op time table,
5. writes a markdown report (default docs/PROFILE.md) with the top ops
   by self-time and the step-level MFU / HBM utilisation numbers.

Usage:
    python -m hotformerloc_tpu.tools.profile_step [--out docs/PROFILE.md]
        [--trace-dir /tmp/jtrace] [--iters 5]

Run on the real chip for meaningful numbers; on CPU it still produces a
(trivial) table, which is what the unit test exercises.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Dict, List, Optional, Tuple


def _top_ops_from_xplane(trace_dir: str, top_n: int = 10
                         ) -> List[Dict[str, object]]:
    """Parse xplane protos under trace_dir into a list of
    {op, time_us, pct} dicts sorted by self time (descending).

    Uses the xprof converter when available; returns [] when the
    package or the trace files are missing (e.g. stripped CPU images).
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return []
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        return []
    try:
        data, _ = rtd.xspace_to_tool_data(paths, "hlo_op_stats", {})
        rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    except Exception:
        return []
    # hlo_op_stats is gviz-style: find the record list.
    if isinstance(rows, dict):
        rows = rows.get("data", rows.get("rows", []))
    ops: Dict[str, float] = {}
    for r in rows if isinstance(rows, list) else []:
        try:
            name = r.get("category") or r.get("hloOpName") or r.get("name")
            t = float(r.get("selfTimeUs", r.get("self_time_us", 0.0)))
        except AttributeError:
            continue
        if name:
            ops[name] = ops.get(name, 0.0) + t
    total = sum(ops.values()) or 1.0
    table = [{"op": k, "time_us": round(v, 1),
              "pct": round(100.0 * v / total, 1)}
             for k, v in sorted(ops.items(), key=lambda kv: -kv[1])]
    return table[:top_n]


def profile_train_step(iters: int = 5, trace_dir: str = "/tmp/jtrace",
                       batch_size: int = 32
                       ) -> Tuple[Dict[str, float], List[Dict[str, object]]]:
    """Compile + time + trace the bench train step.

    Returns (summary, top_ops). summary has flops/bytes per step from
    XLA cost analysis, measured step seconds, and MFU when the chip's
    peak is known.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig, init_train_state,
                                                make_train_step)

    B = batch_size
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
    step = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=4))
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    nbytes = float(cost.get("bytes accessed", 0.0)) if cost else 0.0

    state, stats = compiled(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(stats["loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    try:
        for i in range(iters):
            state, stats = compiled(state, batch, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(stats["loss"])
    finally:
        jax.profiler.stop_trace()
    step_s = (time.perf_counter() - t0) / iters

    from bench import BENCH_BASELINE_SUBMAPS_S, _chip_peak_flops
    peak = _chip_peak_flops()
    summary = {
        "device": jax.devices()[0].device_kind,
        "batch": B,
        "iters": iters,
        "flops_per_step": flops,
        "bytes_per_step": nbytes,
        "step_ms": round(step_s * 1e3, 3),
        "submaps_per_s": round(B / step_s, 2),
        "mfu": round((flops / step_s) / peak, 4) if peak > 0 else 0.0,
        "arith_intensity": round(flops / nbytes, 2) if nbytes else 0.0,
        "bench_bar_submaps_s": BENCH_BASELINE_SUBMAPS_S,
    }
    return summary, _top_ops_from_xplane(trace_dir)


def write_report(out: str, summary: Dict[str, float],
                 top_ops: List[Dict[str, object]]) -> None:
    lines = ["# Train-step profile (flagship Oxford config)", ""]
    lines.append("Generated by `python -m hotformerloc_tpu.tools."
                 "profile_step` — XLA cost analysis + jax profiler "
                 "trace of the multistage train step (bench.py shapes).")
    lines.append("")
    lines.append("## Step summary")
    lines.append("")
    lines.append("| key | value |")
    lines.append("|---|---|")
    for k, v in summary.items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    lines.append("## Top HLO ops by self time")
    lines.append("")
    if top_ops:
        lines.append("| op | self time (us) | % |")
        lines.append("|---|---|---|")
        for r in top_ops:
            lines.append(f"| {r['op']} | {r['time_us']} | {r['pct']} |")
    else:
        lines.append("(no xplane data parsed — xprof unavailable or "
                     "trace empty on this platform)")
    lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="docs/PROFILE.md")
    ap.add_argument("--trace-dir", default="/tmp/jtrace")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)
    summary, top_ops = profile_train_step(args.iters, args.trace_dir,
                                          args.batch)
    print(json.dumps(summary))
    write_report(args.out, summary, top_ops)


if __name__ == "__main__":
    main()
