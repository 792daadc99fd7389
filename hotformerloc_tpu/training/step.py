"""Jitted training / embedding steps, including multistage large-batch
backprop and MESA (EMA distillation).

The reference emulates batch 2048 on one GPU with a three-stage
manual-chain-rule loop in Python
(/root/reference/training/trainer.py:287-365). Here the same algorithm
is a single XLA program: lax.scan over microbatches for the no-grad
embedding pass, loss + embedding-gradient on the full batch, then a
scanned VJP pass accumulating parameter gradients. Combined with the
data mesh this scales the global batch both across chips (DP) and in
per-chip memory (microbatching), with remat inside each block.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hotformerloc_tpu.losses.losses import kd_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    model_state: Any = struct.field(default_factory=dict)  # batch_stats etc.


@dataclasses.dataclass(frozen=True)
class StepConfig:
    accum_steps: int = 1          # microbatches per step (multistage BP)
    ema_decay: float = 0.9998     # ModelEmaV3 decay (trainer.py:160-163)
    mesa: float = 0.0             # MESA weight; > 0 enables distillation
    use_ema: bool = False
    unroll: int = 1               # microbatch-scan unroll factor: lets XLA
    # fuse the per-microbatch gradient accumulation (the step's HBM
    # bandwidth hot spot) at the cost of a bigger HLO


def apply_qkv_init(params, rng, spec: str):
    """Re-initialise every qkv projection kernel per the model config's
    `qkv_init` mode — the reference walks named_modules() post-init and
    re-inits Linear layers whose path contains 'qkv'
    (/root/reference/models/hotformerloc_backbone.py:785-805). Here the
    same walk runs over the flax param pytree.

    spec: "mode[,std]" with mode in torch_default | trunc_normal |
    xavier_uniform | xavier_normal | kaiming_uniform | kaiming_normal.
    Variance formulas follow torch.nn.init with gain('relu')=sqrt(2);
    flax kernels are (fan_in, fan_out).
    """
    parts = [s.strip() for s in str(spec).split(",")]
    mode = parts[0]
    if mode == "torch_default":
        return params
    import flax.linen as fnn
    if mode == "trunc_normal":
        std = float(parts[1]) if len(parts) > 1 else 0.02
        init = fnn.initializers.truncated_normal(std)
    elif mode == "xavier_uniform":
        init = fnn.initializers.variance_scaling(2.0, "fan_avg", "uniform")
    elif mode == "xavier_normal":
        init = fnn.initializers.variance_scaling(2.0, "fan_avg", "normal")
    elif mode == "kaiming_uniform":
        init = fnn.initializers.variance_scaling(2.0, "fan_in", "uniform")
    elif mode == "kaiming_normal":
        init = fnn.initializers.variance_scaling(2.0, "fan_in", "normal")
    else:
        raise ValueError(f"Invalid qkv_init type: {mode}")

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat[0], flat[1]
    out = []
    for i, (path, leaf) in enumerate(leaves):
        names = [str(getattr(p, "key", p)) for p in path]
        if any("qkv" in n for n in names) and names[-1] == "kernel":
            out.append(init(jax.random.fold_in(rng, i), leaf.shape,
                            leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def init_train_state(model, tx, rng, example_batch,
                     use_ema: bool = False,
                     qkv_init: Optional[str] = None) -> TrainState:
    points, pmask = example_batch["points"], example_batch["pmask"]
    # jit the init: eager (op-by-op) execution of the full forward is
    # pathologically slow on CPU debug runs (40+ min at flagship-ish
    # shapes, dominated by per-op dispatch + interpret-mode Pallas);
    # jitted it compiles once like any forward.
    variables = jax.jit(model.init)(rng, points, pmask)
    params = variables["params"]
    if qkv_init:
        params = apply_qkv_init(params, jax.random.fold_in(rng, 7), qkv_init)
    model_state = {k: v for k, v in variables.items() if k != "params"}
    # EMA starts as a *copy* of params: with donate_argnums on the jitted
    # step, aliased buffers would be donated twice and XLA rejects that.
    ema = jax.tree_util.tree_map(jnp.copy, params) if use_ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params),
                      ema_params=ema,
                      model_state=model_state)


def _apply(model, params, model_state, points, pmask, rngs, train: bool,
           plan=None):
    """Returns (out_dict, new_model_state); out_dict has 'global' and
    'octree_overflow' (models/hotformerloc.py). ``plan``: optional
    precomputed OctreePlan (hoisted octree build)."""
    variables = {"params": params, **model_state}
    if train:
        mutable = list(model_state.keys())
        if mutable:
            out, new_state = model.apply(variables, points, pmask,
                                         deterministic=False, train=True,
                                         rngs=rngs, mutable=mutable,
                                         plan=plan)
            return out, new_state
        out = model.apply(variables, points, pmask, deterministic=False,
                          train=True, rngs=rngs, plan=plan)
        return out, model_state
    out = model.apply(variables, points, pmask, plan=plan)
    return out, model_state


def _precompute_plans(model, pts_s, msk_s):
    """Octree + attention plan per microbatch, hoisted out of the
    multistage passes: the plan is parameter-independent, so building
    it once and reusing it in stage 1 AND stage 3 halves the octree /
    neighbour-table work per step. Only when the model config needs no
    per-point normals ('N' requires them at build time).

    Memory trade-off: ALL accum_steps microbatch plans (octree arrays +
    per-level 27-wide neighbour tables) stay live in HBM across both
    scan stages — ~tens of MB per microbatch at the flagship config.
    The documented fit boundary (mb=8 fits / mb=16 OOMs on a 16G v5e,
    CLAUDE.md) was measured WITH this hoisting at accum_steps=4; if the
    microbatch count is raised, re-verify the boundary or rebuild plans
    transiently per microbatch instead."""
    cfg = getattr(model, "cfg", None)
    if cfg is None or "N" in cfg.input_features:
        return None
    from hotformerloc_tpu.models.hotformerloc import build_batched_octree
    from hotformerloc_tpu.ops.plan import build_plan

    # ONE build over the flattened (A*mb) batch instead of lax.map over
    # microbatches: the builder is per-sample (vmapped), so results are
    # identical, but the step dispatches a quarter of the plan-build
    # work serially (plan build measured 83 ms per 8-sample microbatch
    # on v5e — 332 ms/step serialised vs one wider batched build).
    A, mb = pts_s.shape[0], pts_s.shape[1]
    flat_p = pts_s.reshape(A * mb, *pts_s.shape[2:])
    flat_m = msk_s.reshape(A * mb, *msk_s.shape[2:])
    octree = build_batched_octree(flat_p, flat_m, cfg.octree_depth,
                                  cfg.min_depth, cfg.resolve_capacities())
    plan = build_plan(octree, cfg.band_depths(), cfg.band_tile,
                      cfg.band_halo, cfg.dense_depths())
    return jax.tree_util.tree_map(
        lambda x: x.reshape(A, mb, *x.shape[1:]), plan)


def make_train_step(model, tx, loss_fn: Callable,
                    cfg: StepConfig = StepConfig()):
    """Build the jitted train step:
    (state, batch, rng) -> (state, stats).

    batch: {'points': (B, P, 3), 'pmask': (B, P),
            'positives_mask': (B, B), 'negatives_mask': (B, B)}.
    """

    def mb_rngs(rng, i):
        k = jax.random.fold_in(rng, i)
        kd_, kp_ = jax.random.split(k)
        return {"dropout": kd_, "droppath": kp_}

    def single_pass_step(state: TrainState, batch, rng):
        pts, msk = batch["points"], batch["pmask"]

        def loss_of(params):
            out, new_state = _apply(model, params, state.model_state, pts,
                                    msk, mb_rngs(rng, 0), True)
            emb = out["global"]
            loss, stats = loss_fn(emb, batch["positives_mask"],
                                  batch["negatives_mask"])
            stats = dict(stats)
            stats["octree_overflow"] = out["octree_overflow"]
            stats["band_overflow"] = out["band_overflow"]
            if cfg.mesa > 0.0 and state.ema_params is not None:
                t_out, _ = _apply(model, state.ema_params,
                                  state.model_state, pts, msk, None, False)
                loss = loss + cfg.mesa * kd_loss(
                    emb, jax.lax.stop_gradient(t_out["global"]))
            return loss, (stats, new_state)

        grads, (stats, new_state) = jax.grad(loss_of, has_aux=True)(
            state.params)
        return _finish(state, grads, stats, new_state)

    def multistage_step(state: TrainState, batch, rng):
        A = cfg.accum_steps
        pts, msk = batch["points"], batch["pmask"]
        B = pts.shape[0]
        mb = B // A
        # Each microbatch must stay sharded over the data axis; keep the
        # microbatch index replicated and the sample axis distributed.
        from hotformerloc_tpu.parallel.mesh import DATA_AXIS
        from jax.sharding import PartitionSpec

        def r(x):
            y = x.reshape(A, mb, *x.shape[1:])
            try:
                return jax.lax.with_sharding_constraint(
                    y, PartitionSpec(None, DATA_AXIS))
            except Exception:
                # no mesh in context (single-device / no set_mesh path):
                # leave layout to XLA's auto sharding propagation
                return y

        pts_s, msk_s = r(pts), r(msk)
        idx = jnp.arange(A)
        plans = _precompute_plans(model, pts_s, msk_s)

        def fwd(params, p, m, i, plan):
            out, new_state = _apply(model, params, state.model_state, p, m,
                                    mb_rngs(rng, i), True, plan=plan)
            return out["global"], (new_state, out["octree_overflow"],
                                   out["band_overflow"])

        # Stage 1 — embeddings without parameter gradients.
        def s1(carry, xs):
            p, m, i, plan = xs
            emb, (new_state, ovf, bovf) = fwd(state.params, p, m, i, plan)
            if cfg.mesa > 0.0 and state.ema_params is not None:
                t_out, _ = _apply(model, state.ema_params,
                                  state.model_state, p, m, None, False,
                                  plan=plan)
                t_emb = t_out["global"]
            else:
                t_emb = jnp.zeros_like(emb)
            return new_state, (emb, t_emb, ovf, bovf)

        new_state, (embs, t_embs, ovfs, bovfs) = jax.lax.scan(
            s1, state.model_state, (pts_s, msk_s, idx, plans),
            unroll=min(cfg.unroll, A))
        embs = embs.reshape(B, -1)

        # Stage 2 — loss over the full batch, gradient w.r.t. embeddings.
        def loss_of_emb(emb):
            loss, stats = loss_fn(emb, batch["positives_mask"],
                                  batch["negatives_mask"])
            if cfg.mesa > 0.0 and state.ema_params is not None:
                loss = loss + cfg.mesa * kd_loss(emb, t_embs.reshape(B, -1))
            return loss, stats

        (_, stats), g_emb = jax.value_and_grad(
            loss_of_emb, has_aux=True)(embs)
        stats = dict(stats)
        stats["octree_overflow"] = jnp.sum(ovfs)
        stats["band_overflow"] = jnp.sum(bovfs)
        g_emb = g_emb.reshape(A, mb, -1)

        # Stage 3 — recompute per microbatch, chain-rule into params.
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def s3(acc, xs):
            p, m, i, g, plan = xs
            _, vjp = jax.vjp(lambda prm: fwd(prm, p, m, i, plan)[0],
                             state.params)
            (gi,) = vjp(g)
            return jax.tree_util.tree_map(jnp.add, acc, gi), None

        grads, _ = jax.lax.scan(s3, zero_grads,
                                (pts_s, msk_s, idx, g_emb, plans),
                                unroll=min(cfg.unroll, A))
        return _finish(state, grads, stats, new_state)

    def _finish(state, grads, stats, new_state):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.use_ema and ema is not None:
            d = cfg.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, params)
        stats = dict(stats)
        stats["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema,
                          model_state=new_state), stats

    step = single_pass_step if cfg.accum_steps <= 1 else multistage_step
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, loss_fn: Callable):
    """Validation step: embeddings + loss stats, no grads."""

    def eval_step(state: TrainState, batch):
        out, _ = _apply(model, state.params, state.model_state,
                        batch["points"], batch["pmask"], None, False)
        _, stats = loss_fn(out["global"], batch["positives_mask"],
                           batch["negatives_mask"])
        return stats

    return jax.jit(eval_step)


def make_embed_step(model):
    """Inference: points -> descriptors (eval / retrieval path)."""

    def embed(state: TrainState, points, pmask):
        out, _ = _apply(model, state.params, state.model_state, points,
                        pmask, None, False)
        return out["global"]

    return jax.jit(embed)
