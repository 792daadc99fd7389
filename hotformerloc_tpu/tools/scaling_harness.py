"""Weak-scaling throughput harness: submaps/s at 1..N devices.

SURVEY.md §7 step 9: measure the data-parallel train step on a growing
device mesh with a fixed per-device batch (weak scaling), reporting
submaps/s and scaling efficiency per mesh size. On a real slice this
exercises the ICI embedding all-gather inside the loss; on a dev box run
with XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to validate the sharding (numbers are then CPU-meaningless).

CLI:
  python -m hotformerloc_tpu.tools.scaling_harness \
      [--per_device_batch 8] [--accum 1] [--num_points 1024] [--tiny]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_mesh(n_dev: int, per_device_batch: int, accum: int,
               cfg, iters: int = 5):
    import jax
    import jax.numpy as jnp

    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.parallel.mesh import make_mesh, shard_batch
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig,
                                                init_train_state,
                                                make_train_step)

    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices)
    B = per_device_batch * n_dev * max(accum, 1)
    model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=1)
    tx = make_optimizer("adam", lr_schedule(1e-3, 1, 10,
                                            scheduler="constant"))
    rng = np.random.default_rng(0)
    base = rng.uniform(-0.9, 0.9, (B // 2, cfg.num_points, 3)) \
        .astype(np.float32)
    pts = np.repeat(base, 2, axis=0)[:B]
    groups = np.repeat(np.arange(B // 2), 2)[:B]
    batch = {
        "points": pts,
        "pmask": np.ones((B, cfg.num_points), bool),
        "positives_mask": (groups[:, None] == groups[None])
        & ~np.eye(B, dtype=bool),
        "negatives_mask": groups[:, None] != groups[None],
    }
    sbatch = shard_batch(mesh, batch)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), sbatch)
    step = make_train_step(model, tx, loss_fn,
                           StepConfig(accum_steps=accum))
    state, stats = step(state, sbatch, jax.random.PRNGKey(0))
    jax.block_until_ready(stats["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = step(state, sbatch, jax.random.PRNGKey(i))
    jax.block_until_ready(stats["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {"devices": n_dev, "global_batch": B,
            "step_ms": round(dt * 1e3, 2),
            "submaps_s": round(B / dt, 1)}


def main():
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_device_batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test config (CPU-mesh validation)")
    args = ap.parse_args()

    if args.tiny:
        from hotformerloc_tpu.models.config import tiny_test_config
        cfg = tiny_test_config(num_points=args.num_points)
    else:
        from hotformerloc_tpu.models.config import oxford_config
        cfg = oxford_config(num_points=args.num_points,
                            grad_checkpoint=True)

    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    results = []
    for s in sizes:
        r = bench_mesh(s, args.per_device_batch, args.accum, cfg)
        if results:
            r["efficiency"] = round(
                r["submaps_s"] / (results[0]["submaps_s"] * s), 3)
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
