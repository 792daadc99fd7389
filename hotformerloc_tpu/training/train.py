"""Training CLI, mirroring /root/reference/training/train.py:11-41.

Usage:
  python -m hotformerloc_tpu.training.train --config configs/oxford.txt \
      --model_config configs/oxford_model.txt [--resume_from ckpt] [--debug]
"""
from __future__ import annotations

import argparse

from hotformerloc_tpu.config.params import parse_train_config
from hotformerloc_tpu.training.trainer import Trainer
from hotformerloc_tpu.utils.seed import set_seed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="Path to training configuration file")
    ap.add_argument("--model_config", required=True,
                    help="Path to the model-specific configuration file")
    ap.add_argument("--resume_from", default=None,
                    help="Checkpoint to resume training from")
    ap.add_argument("--debug", action="store_true",
                    help="2 batches/epoch, no ckpt writes, fake eval")
    ap.add_argument("--verbose", action="store_true",
                    help="per-module parameter breakdown at init")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num_points", type=int, default=4096,
                    help="Static per-cloud point budget")
    ap.add_argument("--override", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="hyperparameter override (repeatable), e.g. "
                         "--override lr=1e-4 --override patch_size=32")
    args = ap.parse_args()

    set_seed(args.seed)
    params = parse_train_config(args.config, args.model_config,
                                debug=args.debug, verbose=args.verbose,
                                num_points=args.num_points)
    if args.override:
        import ast

        from hotformerloc_tpu.config.params import update_params_from_dict
        ov = {}
        for kv in args.override:
            k, _, v = kv.partition("=")
            try:
                ov[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                ov[k] = v
        update_params_from_dict(params, ov)
    trainer = Trainer(params)
    if args.resume_from:
        trainer.resume(args.resume_from)
    from hotformerloc_tpu.training.elastic import install_preemption_handler
    install_preemption_handler(trainer)
    trainer.train(seed=args.seed)


if __name__ == "__main__":
    main()
