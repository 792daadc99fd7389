"""Flagship-shaped multi-chip dryrun (VERDICT r3 #7 / r4 #1).

One full data-parallel multistage train step at FLAGSHIP-shaped
sharding: the Oxford architecture (patch 48, dilation 4, 3 pyramid
levels, PyramidAttnPoolMixer) with capacities scaled down so uneven
per-depth capacities, the banded-conv escape tables, and the microbatch
sharding constraint (training/step.py) are all exercised on an
``n_devices`` mesh — shape/sharding bugs the tiny dryrun cannot catch.

Run standalone (the driver entry `__graft_entry__.dryrun_multichip`
invokes this as a TIME-BOXED subprocess so a slow XLA:CPU compile on a
small host can never turn the whole multi-chip gate into a timeout —
round 4's rc=124 regression):

    JAX_PLATFORMS=cpu python -m hotformerloc_tpu.tools.flagship_dryrun 8

Design context: the distributed layer is this repo's own (SURVEY.md
§2.10; the reference trains single-GPU only,
/root/reference/training/trainer.py:152-158).
"""
from __future__ import annotations

import os
import sys


def run(n_devices: int, mesh) -> None:
    """Jit + run one flagship-shaped multistage train step over ``mesh``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.parallel.mesh import shard_batch
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig, init_train_state,
                                                make_train_step)

    cfg = oxford_config(
        num_points=512,
        # All transformer caps are one block_num (=192) tile — uneven
        # capacity handling is exercised by the 192/256 mix — and only
        # the depth-8 stem conv clears band_viable (cap 256, Cin 32).
        capacities=(192, 192, 192, 192, 256, 256),
        # 1+2 blocks instead of the production 4+10: the octf stage is
        # an unrolled python loop (4 blocks = 4x HLO on the 2-core
        # driver host), while the HOTFormer stage is nn.scan (length
        # does not change the compile surface). Nothing sharding-
        # relevant depends on block count.
        num_blocks=(1, 2),
        # This variant bounds its Pallas surface: interpret-mode Pallas
        # on the CPU mesh executes python per grid cell (the tiny
        # dryrun runs the attention kernel under the same mesh), so XLA
        # attention + dense-grid CPEs + exactly ONE banded conv (enough
        # to prove BandTables build + kernel sharding on a mesh).
        # dense_cpe_max_depth=4 (production default): cap 192 < 256
        # keeps depth 5 on the flat path.
        use_pallas_attn=False, dense_cpe_max_depth=4,
        # remat off: XLA:CPU compile of the remat'd multistage program
        # took ~50 min on the driver's 2-core host; without it the same
        # shapes/sharding compile in a fraction (memory is not a
        # constraint on the CPU mesh).
        grad_checkpoint=False)
    assert cfg.band_depths() == (8, 9), cfg.band_depths()
    # f32 on the CPU mesh: the XLA:CPU thunk runtime can't execute the
    # bf16-operand/f32-accumulate weight-grad dots some shapes emit
    # (same reason the trainer defaults to f32 off-TPU).
    model = HOTFormerLoc(cfg, dtype=jnp.float32)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=2)
    sched = lr_schedule(1e-3, steps_per_epoch=10, epochs=10,
                        warmup_epochs=2)
    tx = make_optimizer("adam", sched, weight_decay=1e-4)

    A = 4                                   # accum_steps (production)
    B = A * n_devices                       # 1 row per device/microbatch
    rng = np.random.default_rng(1)
    base = rng.uniform(-0.8, 0.8, (B // 2, cfg.num_points, 3)) \
        .astype(np.float32)
    pts = np.repeat(base, 2, axis=0)
    pts += rng.normal(0, 0.02, pts.shape).astype(np.float32)
    groups = np.repeat(np.arange(B // 2), 2)
    batch = {
        "points": jnp.asarray(pts),
        "pmask": jnp.ones((B, cfg.num_points), dtype=bool),
        "positives_mask": jnp.asarray(
            (groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)),
        "negatives_mask": jnp.asarray(groups[:, None] != groups[None]),
    }
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch,
                             use_ema=True)
    step = make_train_step(
        model, tx, loss_fn,
        StepConfig(accum_steps=A, use_ema=True, mesa=0.1))
    sbatch = shard_batch(mesh, batch)
    state, stats = step(state, sbatch, jax.random.PRNGKey(2))
    loss = float(stats["loss"])
    grad_norm = float(stats["grad_norm"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    assert grad_norm > 0.0, (
        f"zero grad norm {grad_norm}: backward pass not exercised")
    print(f"dryrun_multichip({n_devices}) flagship-shaped: ok, "
          f"loss={loss:.4f}, grad_norm={grad_norm:.4f}", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    if os.environ.get("JAX_ENABLE_COMPILATION_CACHE", "").lower() == "false":
        # No persistent cache — its WRITE path intermittently aborts
        # the interpreter on executables of exactly this size (see
        # tests/conftest.py GRAFT_NO_COMPCACHE).
        jax.config.update("jax_enable_compilation_cache", False)
    else:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/root/.cache/jax_comp")
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        # Gate mode (__graft_entry__) passes a huge write threshold:
        # cache READS stay enabled (pre-warmed cache -> fast), the
        # abort-prone WRITE path never runs.
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            int(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                               "0")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if n > 1:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n)
        except Exception:
            pass
    from hotformerloc_tpu.parallel.mesh import make_mesh
    devices = jax.devices()[:n]
    assert len(devices) == n, f"need {n} devices, have {len(jax.devices())}"
    run(n, make_mesh(devices))


if __name__ == "__main__":
    main()
