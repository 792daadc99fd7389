"""Host batch-assembly throughput benchmark (loader only, no device).

VERDICT r3 #5: the single-thread loader is irrelevant at 3 submaps/s
but becomes the bottleneck once the step approaches its roofline; the
reference parallelises with num_workers DataLoader processes
(/root/reference/datasets/dataset_utils.py:164-170). This measures
submaps/s of the full host path — .bin read, float64→32, augmentation
pipeline, clip, pack — at num_points=4096 across worker counts, on a
synthetic PNV-format corpus it generates itself.

Run: python -m hotformerloc_tpu.tools.loader_bench [--root DIR]
Writes docs/LOADER_BENCH.json.
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_corpus(root: str, n: int = 256, points: int = 4096) -> None:
    os.makedirs(os.path.join(root, "clouds"), exist_ok=True)
    import pickle

    from hotformerloc_tpu.data.tuples import TrainingTuple
    rng = np.random.default_rng(0)
    queries = {}
    for i in range(n):
        pc = rng.uniform(-1, 1, (points, 3))
        pc.astype(np.float64).tofile(
            os.path.join(root, "clouds", f"{i:05d}.bin"))
        queries[i] = TrainingTuple(
            i, i, f"clouds/{i:05d}.bin", np.array([i ^ 1]),
            np.sort(np.array([i, i ^ 1, (i + 2) % n])),
            np.array([float(i), 0.0]))
    with open(os.path.join(root, "tuples.pickle"), "wb") as f:
        pickle.dump(queries, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num_points", type=int, default=4096)
    ap.add_argument("--workers", default="0,2,4,8,16")
    ap.add_argument("--mode", default="process", choices=["process", "thread"])
    args = ap.parse_args()

    from hotformerloc_tpu.data.augmentation import (make_set_transform,
                                                    make_train_transform)
    from hotformerloc_tpu.data.loaders import get_pointcloud_loader
    from hotformerloc_tpu.data.pipeline import DataLoader, TrainingDataset
    from hotformerloc_tpu.data.sampler import BatchSampler

    root = args.root or tempfile.mkdtemp(prefix="loader_bench_")
    if not os.path.exists(os.path.join(root, "tuples.pickle")):
        print(f"generating corpus in {root} ...", flush=True)
        make_corpus(root, points=args.num_points)

    ds = TrainingDataset(
        root, "tuples.pickle", get_pointcloud_loader("Oxford"),
        make_train_transform(1, False, None, False, True, 5.0),
        make_set_transform(1, 5.0))
    out = {"batch": args.batch, "num_points": args.num_points,
           "mode": args.mode}
    base = None
    for w in [int(x) for x in args.workers.split(",")]:
        sampler = BatchSampler(ds.queries, args.batch)
        loader = DataLoader(ds, sampler, args.num_points, seed=1,
                            num_workers=w, worker_mode=args.mode)
        # warm the page cache on the first pass, then time a full epoch
        n = 0
        for b in loader:
            n += b["points"].shape[0]
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["points"].shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        out[f"workers_{w}"] = {"submaps_s": round(rate, 1),
                               "speedup": round(rate / base, 2)
                               if base else 1.0}
        base = base or rate
        print(json.dumps({f"workers_{w}": out[f"workers_{w}"]}), flush=True)
    os.makedirs("docs", exist_ok=True)
    with open("docs/LOADER_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/LOADER_BENCH.json")


if __name__ == "__main__":
    main()
