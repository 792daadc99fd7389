"""Real 2-process jax.distributed test of the multi-host input + DP path.

Round-1 review item #5: `make_global_batch`'s multi-process branch and
the process-aware DataLoader had never executed. Here two actual
processes (CPU backend, 2 virtual devices each) each load their own row
shard of the same seeded global batch, stitch it with
`jax.make_array_from_process_local_data`, and run one train step; the
loss must equal a single-process run over the identical global batch
(4 devices, full rows), because the shards reproduce it exactly.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TOOL = "hotformerloc_tpu.tools.multihost_smoke"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)               # conftest's 8-device flag
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    return env


def _run(args, timeout=420):
    p = subprocess.Popen([sys.executable, "-m", TOOL] + args,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=_env(), text=True)
    out, _ = p.communicate(timeout=timeout)
    assert p.returncode == 0, out[-3000:]
    return out


def test_loader_shards_reproduce_single_host_with_transforms(tmp_path):
    # Augmentation seeding must be topology-invariant: every draw is
    # keyed by (seed+epoch, batch, global row), and the batch-level
    # set_transform by (seed+epoch, batch) only — so two hosts loading
    # their own row shards WITH transforms on reproduce the single-host
    # batch exactly (the reference draws the set_transform once per
    # GLOBAL batch, datasets/augmentation.py:11-29).
    from hotformerloc_tpu.data.augmentation import (make_set_transform,
                                                    make_train_transform)
    from hotformerloc_tpu.data.loaders import PNVPointCloudLoader
    from hotformerloc_tpu.data.pipeline import DataLoader, TrainingDataset
    from hotformerloc_tpu.data.sampler import BatchSampler
    from hotformerloc_tpu.tools.multihost_smoke import make_synthetic_dataset

    data = str(tmp_path / "ds")
    make_synthetic_dataset(data)
    ds = TrainingDataset(
        data, "train_tuples.pickle", PNVPointCloudLoader(),
        transform=make_train_transform(2, random_rot_theta=180.0),
        set_transform=make_set_transform(1))

    def batch_for(rank, count):
        sampler = BatchSampler(ds.queries, batch_size=8, seed=7,
                               max_batches=1)
        dl = DataLoader(ds, sampler, num_points=256, seed=3,
                        process_index=rank, process_count=count)
        return next(iter(dl))

    single = batch_for(0, 1)
    shards = [batch_for(r, 2) for r in range(2)]
    for key in ("points", "pmask", "positives_mask", "negatives_mask"):
        stitched = np.concatenate([s[key] for s in shards], axis=0)
        np.testing.assert_array_equal(stitched, single[key], err_msg=key)
    # the set_transform must have actually done something (rotation):
    raw = TrainingDataset(data, "train_tuples.pickle",
                          PNVPointCloudLoader())
    sampler = BatchSampler(raw.queries, batch_size=8, seed=7, max_batches=1)
    plain = next(iter(DataLoader(raw, sampler, num_points=256, seed=3)))
    assert not np.allclose(plain["points"], single["points"])


@pytest.mark.slow
def test_two_process_global_batch_matches_single(tmp_path):
    # --transforms: per-cloud + batch-level augmentation stays on, so
    # this also proves the distributed path with topology-invariant
    # augmentation seeding (round-2 review item #7).
    data = str(tmp_path / "ds")
    single_out = str(tmp_path / "single.json")
    _run(["--data", data, "--make-dataset", "--transforms",
          "--processes", "1", "--devices-per-proc", "4",
          "--out", single_out])
    single = json.load(open(single_out))
    assert single["global_devices"] == 4
    assert np.isfinite(single["loss"]) and single["grad_norm"] > 0

    port = _free_port()
    outs = [str(tmp_path / f"r{r}.json") for r in range(2)]
    procs, logs = [], []
    for r in range(2):
        # rank output goes to FILES, not pipes: this environment's
        # cpu_aot_loader warnings are ~4KB each and repeat per cache
        # load, so an undrained 64KB pipe blocks one rank mid-collective
        # and deadlocks both.
        log = open(tmp_path / f"r{r}.log", "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", TOOL, "--data", data, "--transforms",
             "--processes", "2", "--rank", str(r),
             "--coord", f"localhost:{port}",
             "--devices-per-proc", "2", "--out", outs[r]],
            stdout=log, stderr=subprocess.STDOUT, env=_env(), text=True))
    for p in procs:
        p.wait(timeout=420)

    def _tail(f):
        f.seek(0)
        return f.read()[-3000:]

    assert all(p.returncode == 0 for p in procs), "\n".join(
        _tail(l) for l in logs)
    for log in logs:
        log.close()

    for r in range(2):
        res = json.load(open(outs[r]))
        assert res["global_devices"] == 4
        assert res["global_batch"] == single["global_batch"]
        # identical global batch -> identical loss up to reduction order
        np.testing.assert_allclose(res["loss"], single["loss"],
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(res["grad_norm"], single["grad_norm"],
                                   rtol=2e-4, atol=2e-5)
