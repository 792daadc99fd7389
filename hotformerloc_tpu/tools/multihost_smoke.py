"""Multi-process CPU smoke test for the multi-host data-parallel path.

The reference has no distributed layer (SURVEY.md §2.10); ours shards
the global batch over a 1-D data mesh. This tool actually EXECUTES the
multi-host branch (`parallel.mesh.make_global_batch` +
`jax.distributed.initialize`) on CPU: each process builds the same
seeded sampler, loads only its row shard of the global batch
(DataLoader process_index/process_count), stitches shards into global
arrays, and runs one full train step.

Because the shards reproduce the single-host batch exactly (transforms
off), the loss/grad_norm must match a --processes 1 run bitwise-close;
tests/test_multihost.py asserts that equivalence.

Usage (rank r of N):
    python -m hotformerloc_tpu.tools.multihost_smoke --data DIR \
        --processes N --rank r --coord localhost:PORT \
        --devices-per-proc 2 --out result.json
"""
from __future__ import annotations

import argparse
import json
import os


def make_synthetic_dataset(path: str, n: int = 16, points: int = 256,
                           seed: int = 0) -> None:
    """PNV-format .bin clouds + a training pickle: i is positive with
    i^1, non-negative with {i, i^1, (i+2) % n}."""
    import pickle

    import numpy as np

    from hotformerloc_tpu.data.tuples import TrainingTuple
    os.makedirs(os.path.join(path, "clouds"), exist_ok=True)
    rng = np.random.default_rng(seed)
    queries = {}
    for i in range(n):
        c = rng.uniform(-0.9, 0.9, (points, 3)).astype(np.float64)
        c.tofile(os.path.join(path, "clouds", f"{i:03d}.bin"))
        queries[i] = TrainingTuple(
            i, i, f"clouds/{i:03d}.bin", np.array([i ^ 1]),
            np.sort(np.array([i, i ^ 1, (i + 2) % n])),
            np.array([float(i), 0.0]))
    with open(os.path.join(path, "train_tuples.pickle"), "wb") as f:
        pickle.dump(queries, f)


def run(data_dir: str, processes: int, rank: int, coord: str,
        devices_per_proc: int, transforms: bool = False) -> dict:
    # Backend config BEFORE any jax device use. Each rank gets its OWN
    # persistent-cache dir: with a shared dir one rank can load a cached
    # (even foreign-machine AOT) executable while the other compiles
    # fresh, and the two executables then disagree on gloo communicator
    # incarnation numbering -> rendezvous deadlock. Per-rank dirs make
    # cache behaviour deterministic and identical across ranks.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    cache_dir = "/root/.cache/jax_comp" if processes == 1 else \
        f"/root/.cache/jax_comp_mh_rank{rank}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devices_per_proc)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if processes > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=processes,
                                   process_id=rank)
    import jax.numpy as jnp
    import numpy as np

    from hotformerloc_tpu.data.loaders import PNVPointCloudLoader
    from hotformerloc_tpu.data.pipeline import DataLoader, TrainingDataset
    from hotformerloc_tpu.data.sampler import BatchSampler
    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import tiny_test_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    from hotformerloc_tpu.parallel.mesh import make_global_batch, make_mesh
    from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
    from hotformerloc_tpu.training.step import (StepConfig, init_train_state,
                                                make_train_step)

    assert jax.process_count() == processes, (
        jax.process_count(), processes)

    def barrier(name: str, timeout_s: int = 900) -> None:
        """Control-plane barrier (coordination service, NOT a device
        collective). XLA:CPU's gloo rendezvous/ops time out after 30s,
        so ranks must enter their first collective aligned — a cold
        persistent-cache compile of the train step skews them by
        minutes. The coordination-service barrier has no such limit."""
        if processes > 1:
            from jax._src import distributed as jdist
            jdist.global_state.client.wait_at_barrier(
                name, timeout_in_ms=timeout_s * 1000)

    mesh = make_mesh()                       # all global devices

    cfg = tiny_test_config(num_points=256)
    tr = st = None
    if transforms:
        # WITH augmentation: every draw is keyed by (epoch, batch,
        # global row) in the DataLoader, so the 2-process batch must
        # still reproduce the single-process batch exactly — including
        # the batch-level set_transform rotation, which the reference
        # draws ONCE per global batch (datasets/augmentation.py:11-29).
        from hotformerloc_tpu.data.augmentation import (make_set_transform,
                                                        make_train_transform)
        tr = make_train_transform(2, random_rot_theta=180.0)
        st = make_set_transform(1)
    ds = TrainingDataset(data_dir, "train_tuples.pickle",
                         PNVPointCloudLoader(), transform=tr,
                         set_transform=st)
    sampler = BatchSampler(ds.queries, batch_size=8, seed=7,
                           max_batches=1)
    loader = DataLoader(ds, sampler, cfg.num_points, seed=3,
                        process_index=jax.process_index(),
                        process_count=processes)
    host_batch = next(iter(loader))
    batch = make_global_batch(mesh, host_batch)

    model = HOTFormerLoc(cfg)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=1)
    tx = make_optimizer("adam", lr_schedule(1e-3, 10, 10, warmup_epochs=2),
                        weight_decay=1e-4)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=2))
    # Compile ahead of time (local, no collectives executed), then align
    # the ranks before the first real collective rendezvous.
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    barrier("post_compile")
    state, stats = compiled(state, batch, jax.random.PRNGKey(1))
    out = {"processes": processes, "rank": rank,
           "global_devices": len(jax.devices()),
           "global_batch": int(np.asarray(
               jnp.shape(batch["points"])[0])),
           "loss": float(stats["loss"]),
           "grad_norm": float(stats["grad_norm"])}
    if processes > 1:
        barrier("pre_shutdown")
        jax.distributed.shutdown()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--processes", type=int, default=1)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--coord", default="localhost:12355")
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--make-dataset", action="store_true")
    ap.add_argument("--transforms", action="store_true",
                    help="run WITH per-cloud + batch-level augmentation")
    args = ap.parse_args()
    if args.make_dataset:
        make_synthetic_dataset(args.data)
    res = run(args.data, args.processes, args.rank, args.coord,
              args.devices_per_proc, transforms=args.transforms)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
