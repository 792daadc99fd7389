"""Bisect the train step's wall-clock on the real chip.

The honest (fetch-synced) bench measured 21.6 s/step for a 1.57 TFLOP
program — ~0.07 TF/s on a chip that sustains 154 TF/s on plain matmuls.
This tool times the step's stages separately to find the pathology:

  1. null         — trivial jit program (tunnel roundtrip floor)
  2. octree       — on-device octree build + plan only
  3. forward      — embed forward (microbatch 8), octree included
  4. loss_fwd     — forward + TruncatedSmoothAP loss value
  5. grad         — full value_and_grad of one microbatch
  6. multistage   — the production 4-microbatch scanned step

Usage: python -m hotformerloc_tpu.tools.bisect_step [--stages 1,2,...]
Prints one JSON line per stage.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, args, iters, sync_tree=None):
    from hotformerloc_tpu.utils.profiling import fetch_sync
    out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="null,octree,forward,loss_fwd,"
                                        "grad,multistage")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--micro", type=int, default=8)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig, init_train_state,
                                                make_train_step)

    B, MB = args.batch, args.micro
    cfg = oxford_config(grad_checkpoint=True)
    model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=4)

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
    mpts, mmask = batch["points"][:MB], batch["pmask"][:MB]

    def report(stage, dt, iters):
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "iters": iters}), flush=True)

    if "null" in stages:
        f = jax.jit(lambda x: x + 1.0)
        dt = _timeit(f, (jnp.ones((8, 128)),), 20)
        report("null", dt, 20)

    if "octree" in stages or "plan" in stages:
        from hotformerloc_tpu.octree.build import build_batched_octree
        from hotformerloc_tpu.ops.plan import build_plan

        def octree_fn(p, m):
            oct_ = build_batched_octree(p, m, cfg.octree_depth,
                                        cfg.min_depth,
                                        cfg.resolve_capacities())
            return jax.tree_util.tree_leaves(oct_)

        f = jax.jit(octree_fn)
        dt = _timeit(f, (mpts, mmask), args.iters)
        report("octree", dt, args.iters)

        def plan_fn(p, m):
            oct_ = build_batched_octree(p, m, cfg.octree_depth,
                                        cfg.min_depth,
                                        cfg.resolve_capacities())
            return jax.tree_util.tree_leaves(build_plan(oct_))

        f = jax.jit(plan_fn)
        dt = _timeit(f, (mpts, mmask), args.iters)
        report("octree+plan", dt, args.iters)

    variables = model.init(jax.random.PRNGKey(0), mpts, mmask)

    def embed(vs, p, m):
        out = model.apply(vs, p, m)
        return out["global"] if isinstance(out, dict) else out

    if "forward" in stages:
        f = jax.jit(embed)
        dt = _timeit(f, (variables, mpts, mmask), args.iters)
        report("forward", dt, args.iters)

    if "loss_fwd" in stages or "grad" in stages:
        pm = batch["positives_mask"][:MB, :MB]
        nm = batch["negatives_mask"][:MB, :MB]

        def lf(params, other):
            vs = {"params": params, **other}
            emb = embed(vs, mpts, mmask)
            out = loss_fn(emb, pm, nm)
            return out[0] if isinstance(out, tuple) else out

        other = {k: v for k, v in variables.items() if k != "params"}
        if "loss_fwd" in stages:
            f = jax.jit(lf)
            dt = _timeit(f, (variables["params"], other), args.iters)
            report("loss_fwd", dt, args.iters)
        if "grad" in stages:
            g = jax.jit(jax.grad(lf))
            dt = _timeit(g, (variables["params"], other), args.iters)
            report("grad", dt, args.iters)

    if "multistage" in stages:
        sched = lr_schedule(5e-4, steps_per_epoch=100, epochs=150,
                            warmup_epochs=5, milestones=[100])
        tx = make_optimizer("adam", sched, weight_decay=1e-4)
        state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, tx, loss_fn,
                               StepConfig(accum_steps=B // MB))

        def sf(s, b):
            s2, stats = step(s, b, jax.random.PRNGKey(1))
            return stats["loss"]

        # time without donation hazards: call step directly
        from hotformerloc_tpu.utils.profiling import fetch_sync
        state, stats = step(state, batch, jax.random.PRNGKey(0))
        fetch_sync(stats["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, stats = step(state, batch, jax.random.PRNGKey(i))
        fetch_sync(stats["loss"])
        report("multistage", (time.perf_counter() - t0) / args.iters,
               args.iters)


if __name__ == "__main__":
    main()
