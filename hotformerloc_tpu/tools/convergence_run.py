"""Train the REAL model to convergence on the synthetic benchmark and
commit the evidence (VERDICT r3 #2 — the missing proof that
octree → attention → loss → optimizer actually learns).

Generates the synthetic place-recognition benchmark
(tools/synthetic_benchmark.py), trains a flagship-shaped HOTFormerLoc
(channels 128/256, 4+10 blocks, patch 48, 3 pyramid levels, Pallas
attention + banded convs; reduced num_points/octree_depth for wall
clock) with the production TruncatedSmoothAP recipe, runs the full PNV
evaluation protocol every eval_freq epochs, and writes the loss / AR@1
trajectory to docs/CONVERGENCE.json. Success bar: model (not oracle)
AR@1 >= 95 on the synthetic eval. Reference purpose:
/root/reference/training/trainer.py:367-539 feeding
eval/pnv_evaluate.py:26-113.

Run (on the TPU): python -m hotformerloc_tpu.tools.convergence_run \
    [--out /tmp/synth_bench] [--epochs 60]
"""
from __future__ import annotations

import argparse
import json
import os

def model_cfg(exact: bool) -> str:
    """Model INI. ``exact`` = the PRODUCTION Oxford recipe (octree
    depth 9, 4096 points, occupancy-tuned capacities — VERDICT r4 #4:
    drive the depth-8/9 band tables, stem path and production
    capacities through a real optimisation loop); otherwise the r4
    reduced-shape variant (depth 7, 1024 points) for quick wall-clock.
    """
    caps = ("2688,4224,4224,4224,4096,4096" if exact
            else "192,384,576,1152,1024,1024")
    return f"""[MODEL]
model = HOTFormerLoc
coordinates = cartesian
channels = 128,256
num_blocks = 4,10
num_heads = 8,16
num_pyramid_levels = 3
num_octf_levels = 1
patch_size = 48
dilation = 4
drop_path = 0.2
num_input_downsamples = 2
downsample_input_embeddings = True
ct_size = 1
ADaPE_mode = cov
pooling = PyramidAttnPoolMixer
k_pooled_tokens = 74,36,18
feature_size = 256
output_dim = 256
normalize_embeddings = True
input_features = P
conv_norm = layernorm
grad_checkpoint = True
capacities = {caps}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_bench_flagship")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--places_per_loc", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--train_variants", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batch_split_size", type=int, default=0,
                    help="microbatch size (0 = single pass)")
    ap.add_argument("--eval_freq", type=int, default=10)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--json_out", default="docs/CONVERGENCE.json")
    ap.add_argument("--exact", action="store_true",
                    help="flagship-EXACT shapes: octree depth 9, 4096 "
                         "points, production Oxford capacities; "
                         "implies --num_points 4096 and microbatch 8 "
                         "unless overridden")
    ap.add_argument("--run_name", default=None)
    args = ap.parse_args()
    if args.exact:
        if args.num_points == 1024:
            args.num_points = 4096
        if args.batch_split_size == 0:
            # B=32 single-pass OOMs the 16G v5e (bench.py); production
            # multistage microbatch
            args.batch_split_size = 8
        if args.json_out == "docs/CONVERGENCE.json":
            args.json_out = "docs/CONVERGENCE_flagship.json"
    run_name = args.run_name or ("ConvergenceFlagship" if args.exact
                                 else "ConvergenceRun")

    from hotformerloc_tpu.tools.synthetic_benchmark import generate
    out = args.out
    if not os.path.exists(os.path.join(out, "train_tuples.pickle")):
        info = generate(out, places_per_loc=args.places_per_loc,
                        num_points=args.num_points,
                        train_variants=args.train_variants)
        print("generated:", info, flush=True)

    # flagship model config: --exact = production depth 9 (stem 2 /
    # pyramid 3 -> transformer depths 7..4, min_depth 4, the real
    # Oxford recipe); default = depth 7 reduced shapes
    depth = 9 if args.exact else 7
    split = (f"batch_split_size = {args.batch_split_size}\n"
             if args.batch_split_size else "")
    with open(os.path.join(out, "model_flagship.txt"), "w") as f:
        f.write(model_cfg(args.exact))
    with open(os.path.join(out, "train_flagship.txt"), "w") as f:
        f.write(f"""[DEFAULT]
dataset_folder = {out}

[TRAIN]
dataset_name = Oxford
train_file = train_tuples.pickle
validation = False
num_workers = 4
batch_size = {args.batch}
{split}val_batch_size = {args.batch}
lr = {args.lr}
epochs = {args.epochs}
warmup_epochs = 5
scheduler = CosineAnnealingLR
min_lr = 1e-5
weight_decay = 1e-4
loss = TruncatedSmoothAP
tau1 = 0.01
positives_per_query = 3
aug_mode = 1
set_aug_mode = 1
octree_depth = {depth}
eval_freq = {args.eval_freq}
save_freq = 0
""")

    from hotformerloc_tpu.config.params import parse_train_config
    from hotformerloc_tpu.training.trainer import Trainer
    from hotformerloc_tpu.utils.seed import set_seed

    set_seed(42)
    params = parse_train_config(
        os.path.join(out, "train_flagship.txt"),
        os.path.join(out, "model_flagship.txt"),
        num_points=args.num_points)
    trainer = Trainer(params, weights_dir="weights",
                      model_name=run_name)
    trainer.train(seed=42)

    # Collate the JSONL trajectory into the summary json
    logf = os.path.join(trainer.weights_dir, f"{run_name}_log.jsonl")
    losses, evals = [], []
    with open(logf) as f:
        for line in f:
            r = json.loads(line)
            if r.get("phase") == "train":
                losses.append({"epoch": r["epoch"],
                               "loss": round(r.get("loss", -1), 4),
                               "ap": round(r.get("ap", -1), 4),
                               "recall_at_1": round(
                                   r.get("recall_at_1", -1), 4)})
            elif r.get("phase") == "eval":
                evals.append({"epoch": r["epoch"],
                              "avg_AR1": round(r["avg_AR1"], 2)})
    summary = {
        "config": ("flagship-EXACT (128/256ch, 4+10 blocks, patch 48, "
                   "3 pyramid levels, 4096 pts, octree depth 9, "
                   "production capacities, microbatch "
                   f"{args.batch_split_size})" if args.exact else
                   "flagship-shaped (128/256ch, 4+10 blocks, patch 48, "
                   f"3 pyramid levels, {args.num_points} pts, depth 7)"),
        "dataset": f"synthetic benchmark, {args.places_per_loc * 4} "
                   f"places x {args.train_variants} train variants",
        "epochs": args.epochs,
        "final_loss": losses[-1]["loss"] if losses else None,
        "best_avg_AR1": max((e["avg_AR1"] for e in evals), default=None),
        "eval_trajectory": evals,
        "train_trajectory": losses,
    }
    os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("train_trajectory",)}, indent=1))
    print("wrote", args.json_out)


if __name__ == "__main__":
    main()
