"""Evaluation CLI (~ /root/reference/eval/pnv_evaluate.py:314-370).

Usage:
  python -m hotformerloc_tpu.evaluation.pnv_evaluate --config ... \
      --model_config ... --weights weights/.../model_best.ckpt [--log]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from hotformerloc_tpu.config.params import parse_train_config
from hotformerloc_tpu.evaluation.evaluate import (evaluate, print_eval_stats,
                                                  write_eval_stats)
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
from hotformerloc_tpu.training.step import init_train_state, make_embed_step
from hotformerloc_tpu.training.trainer import load_checkpoint


def load_model_embed_fn(params, weights: str = None):
    """(embed_fn, model_name): build the model, restore weights, return
    the jitted (points, pmask) -> (B, D) closure used by all
    evaluators."""
    cfg = params.model_params.config
    model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
    tx = make_optimizer("adam", lr_schedule(1e-3, 1, 1))
    example = {"points": jnp.zeros((2, cfg.num_points, 3), jnp.float32),
               "pmask": jnp.ones((2, cfg.num_points), bool)}
    state = init_train_state(model, tx, jax.random.PRNGKey(0), example)
    if weights:
        try:
            state, _, _, _ = load_checkpoint(weights, state)
        except (ValueError, KeyError):
            # params-only checkpoint (e.g. converted reference weights,
            # tools/convert_reference_weights.py)
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(weights),
                {"params": jax.device_get(state.params)})
            state = state.replace(params=restored["params"])
    embed = make_embed_step(model)
    model_name = os.path.splitext(os.path.basename(weights))[0] \
        if weights else cfg.model
    return (lambda p, m: embed(state, p, m)), model_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint directory")
    ap.add_argument("--debug", action="store_true",
                    help="random embeddings, protocol smoke test")
    ap.add_argument("--log", action="store_true",
                    help="log false positives / top-5 matches to txt")
    ap.add_argument("--num_points", type=int, default=4096)
    args = ap.parse_args()

    params = parse_train_config(args.config, args.model_config,
                                debug=args.debug,
                                num_points=args.num_points)
    embed_fn, model_name = load_model_embed_fn(params, args.weights)

    stats = evaluate(embed_fn, params, debug=args.debug, log=args.log,
                     model_name=model_name)
    print_eval_stats(stats)
    prefix = f"{args.model_config}, {args.weights}"
    write_eval_stats(f"pnv_{params.dataset_name}_results.txt", prefix, stats)


if __name__ == "__main__":
    main()
