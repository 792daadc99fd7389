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


def _classify(cat: str, fw_op: str) -> str:
    """Coarse per-op class for the rollup: gather / scatter / conv /
    matmul / collective / elementwise-fusion / other."""
    s = (cat + " " + fw_op).lower()
    if "scatter" in s:
        return "scatter"
    if "gather" in s or "take" in s or "dynamic-slice" in s:
        return "gather"
    if "convolution" in s or "conv" in s:
        return "conv"
    if "dot" in s or "einsum" in s or "matmul" in s:
        return "matmul"
    if any(k in s for k in ("all-reduce", "all-gather", "collective",
                            "reduce-scatter", "psum")):
        return "collective"
    if "copy" in s or "transpose" in s or "reshape" in s:
        return "copy/transpose"
    if "fusion" in s:
        return "fusion(elementwise)"
    return "other"


def _top_ops_from_xplane(trace_dir: str, top_n: int = 25
                         ) -> Tuple[List[Dict[str, object]],
                                    List[Dict[str, object]]]:
    """Parse xplane protos under trace_dir into (top_ops, rollup).

    top_ops: {op, time_us, pct} sorted by self time desc, top_n rows.
    rollup: per-class {cls, time_us, pct, count} over ALL ops, so the
    long tail is visible even when no single op is hot.
    Uses the xprof converter when available; returns ([], []) when the
    package or the trace files are missing (e.g. stripped CPU images).
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return [], []
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        return [], []
    try:
        data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        tbl = json.loads(data) if isinstance(data, str) else data
    except Exception:
        return [], []
    # gviz DataTable: {"cols": [{id, label, ...}], "rows": [{"c": [{"v"}]}]}
    if not isinstance(tbl, dict) or "cols" not in tbl:
        return [], []
    idx = {c.get("id"): i for i, c in enumerate(tbl["cols"])}
    need = ("hlo_op_name", "category", "total_self_time", "occurrences")
    if any(k not in idx for k in need):
        return [], []

    def val(row, key):
        cell = row["c"][idx[key]]
        return cell.get("v") if isinstance(cell, dict) else None

    ops: Dict[str, Dict[str, float]] = {}
    rollup: Dict[str, Dict[str, float]] = {}
    total = 0.0
    for r in tbl.get("rows", []):
        name = val(r, "hlo_op_name") or "?"
        cat = val(r, "category") or "?"
        fw = (val(r, "tf_op_name") or "") if "tf_op_name" in idx else ""
        t = float(val(r, "total_self_time") or 0.0)
        occ = int(val(r, "occurrences") or 0)
        total += t
        d = ops.setdefault(name, {"op": name, "category": cat,
                                  "fw_op": fw, "time_us": 0.0, "count": 0})
        d["time_us"] += t
        d["count"] += occ
        cls = _classify(cat, fw)
        c = rollup.setdefault(cls, {"cls": cls, "time_us": 0.0, "count": 0})
        c["time_us"] += t
        c["count"] += occ
    total = total or 1.0
    table = sorted(ops.values(), key=lambda d: -d["time_us"])[:top_n]
    for d in table:
        d["time_us"] = round(d["time_us"], 1)
        d["pct"] = round(100.0 * d["time_us"] / total, 1)
    roll = sorted(rollup.values(), key=lambda d: -d["time_us"])
    for d in roll:
        d["time_us"] = round(d["time_us"], 1)
        d["pct"] = round(100.0 * d["time_us"] / total, 1)
    return table, roll


def profile_train_step(iters: int = 5, trace_dir: str = "/tmp/jtrace",
                       batch_size: int = 32
                       ) -> Tuple[Dict[str, float], List[Dict[str, object]],
                                  List[Dict[str, object]]]:
    """Compile + time + trace the bench train step.

    Returns (summary, top_ops, rollup). summary has flops/bytes per step
    from XLA cost analysis, measured step seconds, and MFU when the
    chip's peak is known.
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

    from hotformerloc_tpu.utils.profiling import fetch_sync

    # Warmup + timing use the jit FAST PATH, not the AOT `compiled`
    # handle: on the tunnelled platform the AOT call path adds large
    # per-call host overhead (measured ~100x). Sync via a value fetch —
    # block_until_ready is not a reliable barrier here (fetch_sync doc).
    for i in range(3):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
    fetch_sync(stats["loss"])

    # Time WITHOUT the trace active: profiling (especially over a
    # tunnelled device) adds per-step overhead that would corrupt the
    # step_ms / MFU numbers. The trace pass below reuses the same
    # step on fewer iterations purely for the op table.
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = step(state, batch, jax.random.PRNGKey(i + 1))
    fetch_sync(stats["loss"])
    step_s = (time.perf_counter() - t0) / iters

    jax.profiler.start_trace(trace_dir)
    try:
        for i in range(min(iters, 2)):
            state, stats = step(state, batch, jax.random.PRNGKey(i + 1))
        fetch_sync(stats["loss"])
    finally:
        jax.profiler.stop_trace()

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
    top_ops, rollup = _top_ops_from_xplane(trace_dir)
    return summary, top_ops, rollup


def write_report(out: str, summary: Dict[str, float],
                 top_ops: List[Dict[str, object]],
                 rollup: Optional[List[Dict[str, object]]] = None) -> None:
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
    if rollup:
        lines.append("## Per-class rollup (all ops, 100% of device time)")
        lines.append("")
        lines.append("| class | n | self time (us) | % |")
        lines.append("|---|---|---|---|")
        for r in rollup:
            lines.append(f"| {r['cls']} | {r.get('count', '?')} | "
                         f"{r['time_us']} | {r['pct']} |")
        lines.append("")
    lines.append("## Top HLO ops by self time")
    lines.append("")
    if top_ops:
        lines.append("| op | category | framework op | n | "
                     "self time (us) | % |")
        lines.append("|---|---|---|---|---|---|")
        for r in top_ops:
            fw = str(r.get("fw_op", ""))[-60:]
            lines.append(f"| {r['op']} | {r.get('category', '?')} | "
                         f"{fw} | {r.get('count', '?')} | "
                         f"{r['time_us']} | {r['pct']} |")
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
    summary, top_ops, rollup = profile_train_step(args.iters,
                                                  args.trace_dir,
                                                  args.batch)
    print(json.dumps(summary))
    write_report(args.out, summary, top_ops, rollup)


if __name__ == "__main__":
    main()
