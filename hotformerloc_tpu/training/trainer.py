"""Training driver: epoch loop, checkpoint/resume, eval hooks, dynamic
batch expansion, metric logging.

The TPU-native counterpart of /root/reference/training/trainer.py:23-539.
Differences by design:
  * one jitted multistage train step replaces the Python 3-stage loop;
  * data parallelism over a jax mesh replaces single-device training;
  * orbax checkpoints store the full pytree train state (params, opt
    state, EMA, step) — same recovery granularity (epoch) as the
    reference's torch ckpt dict (trainer.py:130-144);
  * metrics go to JSONL (+optional wandb if available) instead of
    mandatory wandb.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hotformerloc_tpu.config.params import TrainParams, loss_kwargs
from hotformerloc_tpu.data.augmentation import (make_set_transform,
                                                make_train_transform)
from hotformerloc_tpu.data.loaders import get_pointcloud_loader
from hotformerloc_tpu.data.pipeline import DataLoader, TrainingDataset
from hotformerloc_tpu.data.sampler import BatchSampler
from hotformerloc_tpu.losses.losses import make_loss
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc, param_count
from hotformerloc_tpu.parallel.mesh import (make_global_batch,
                                            make_mesh)
from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
from hotformerloc_tpu.training.step import (StepConfig, TrainState,
                                            init_train_state,
                                            make_embed_step, make_eval_step,
                                            make_train_step)


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    best_metric: float = 0.0,
                    extra_meta: Optional[Dict] = None):
    """Full-state orbax checkpoint + JSON side meta.

    extra_meta carries the non-array training context the reference
    stores in its ckpt dict (trainer.py:130-144): wandb run id (so a
    resumed run continues the same wandb history, trainer.py:383-391)
    and the dynamic-batch-expansion sampler state (trainer.py:74-90).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": jax.device_get(state),
                      "meta": {"epoch": np.asarray(epoch, np.int64),
                               "best": np.asarray(best_metric,
                                                  np.float64)}},
               force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump(extra_meta or {}, f)


def load_checkpoint(path: str, template_state: TrainState):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"state": jax.device_get(template_state),
              "meta": {"epoch": np.asarray(0, np.int64),
              "best": np.asarray(0.0, np.float64)}}
    restored = ckptr.restore(path, target)
    extra = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return restored["state"], int(restored["meta"]["epoch"]), \
        float(restored["meta"]["best"]), extra


class MetricLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False):
        self.path = path
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
            except ImportError:
                print("[WARN] wandb unavailable; logging to JSONL only")

    def ensure_run(self, config: Dict, run_id: Optional[str] = None,
                   name: Optional[str] = None) -> Optional[str]:
        """Start (or resume, given a stored id) the wandb run — the
        reference's resumable-logging behaviour
        (training/trainer.py:383-391). Returns the active run id."""
        if self.wandb is None:
            return None
        if self.wandb.run is None:
            self.wandb.init(project="hotformerloc_tpu", name=name,
                            id=run_id, resume="allow", config=config)
        return getattr(self.wandb.run, "id", None)

    def log(self, record: Dict):
        record = {k: (float(v) if isinstance(v, (np.floating, jnp.ndarray))
                      else v) for k, v in record.items()}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.wandb and self.wandb.run is not None:
            self.wandb.log(record)


class Trainer:
    """End-to-end training orchestration (trainer.py:23-539)."""

    def __init__(self, params: TrainParams, weights_dir: str = "weights",
                 model_name: Optional[str] = None,
                 dtype=None, accum_steps: Optional[int] = None):
        self.params = params
        cfg = params.model_params.config
        self.cfg = cfg
        if dtype is None:
            # bf16 compute on TPU; f32 on the CPU debug surface — the
            # XLA:CPU thunk runtime cannot execute the bf16-operand /
            # f32-accumulate weight-grad dots our custom VJPs emit
            # ("Unsupported element type for DotThunk: BF16 x BF16 =
            # F32", reproduced at several stem/CPE shapes), and CPU
            # runs are debug-scale anyway.
            import jax
            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        self.model = HOTFormerLoc(cfg, dtype=dtype)
        self.mesh = make_mesh()
        self.model_name = model_name or \
            f"{cfg.model}_{time.strftime('%Y%m%d_%H%M')}"
        self.weights_dir = os.path.join(weights_dir,
                                        params.dataset_name or "default")
        os.makedirs(self.weights_dir, exist_ok=True)
        self.logger = MetricLogger(
            os.path.join(self.weights_dir, self.model_name + "_log.jsonl"),
            use_wandb=params.wandb)

        # data
        loader = get_pointcloud_loader(params.dataset_name or "")
        tt = make_train_transform(params.aug_mode, params.normalize_points,
                                  params.scale_factor,
                                  params.unit_sphere_norm, params.zero_mean,
                                  params.random_rot_theta)
        st = make_set_transform(params.set_aug_mode, params.random_rot_theta)
        self.train_ds = TrainingDataset(
            params.dataset_folder, params.train_file, loader, tt, st,
            params.model_params.coordinates)
        # Multi-host: all hosts build the SAME seeded sampler (identical
        # global batch lists) and each loads only its row shard; the
        # step assembles the global batch via make_global_batch
        # (SURVEY.md §2.10).
        import jax
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.train_sampler = BatchSampler(
            self.train_ds.queries, params.batch_size,
            params.batch_size_limit, params.batch_expansion_rate,
            max_batches=2 if params.debug else None,
            seed=1234 if self.process_count > 1 else None)
        self.train_loader = DataLoader(self.train_ds, self.train_sampler,
                                       cfg.num_points,
                                       process_index=self.process_index,
                                       process_count=self.process_count,
                                       num_workers=params.num_workers)
        self.val_loader = None
        if params.validation and params.val_file:
            from hotformerloc_tpu.data.augmentation import make_val_transform
            vt = make_val_transform(params.normalize_points,
                                    params.scale_factor,
                                    params.unit_sphere_norm,
                                    params.zero_mean)
            val_ds = TrainingDataset(params.dataset_folder, params.val_file,
                                     loader, vt, None,
                                     params.model_params.coordinates)
            val_sampler = BatchSampler(val_ds.queries,
                                       params.val_batch_size,
                                       max_batches=2 if params.debug
                                       else None)
            self.val_loader = DataLoader(val_ds, val_sampler,
                                         cfg.num_points,
                                         num_workers=params.num_workers)

        # steps
        steps_per_epoch = max(len(self.train_ds)
                              // max(params.batch_size, 1), 1)
        sched = lr_schedule(params.lr, steps_per_epoch, params.epochs,
                            params.scheduler, params.scheduler_milestones,
                            params.gamma, params.min_lr,
                            params.warmup_epochs)
        self.tx = make_optimizer(params.optimizer, sched,
                                 params.weight_decay)
        self.loss_fn = make_loss(params.loss, **loss_kwargs(params))
        if accum_steps is None:
            accum_steps = (max(params.batch_size
                               // (params.batch_split_size or
                                   params.batch_size), 1)
                           if params.batch_split_size else 1)
        self.use_ema = params.mesa > 0.0
        self.step_cfg_nomesa = StepConfig(accum_steps=accum_steps,
                                          use_ema=self.use_ema, mesa=0.0)
        self.step_cfg_mesa = StepConfig(accum_steps=accum_steps,
                                        use_ema=self.use_ema,
                                        mesa=params.mesa)
        self.train_step = make_train_step(self.model, self.tx, self.loss_fn,
                                          self.step_cfg_nomesa)
        self.train_step_mesa = make_train_step(self.model, self.tx,
                                               self.loss_fn,
                                               self.step_cfg_mesa) \
            if params.mesa > 0.0 else None
        self.eval_step = make_eval_step(self.model, self.loss_fn)
        self._embed = make_embed_step(self.model)
        self.state: Optional[TrainState] = None
        self.start_epoch = 1
        self.best_metric = 0.0
        # set by elastic.install_preemption_handler on SIGTERM/SIGUSR1
        self.preempted = False

    # -- lifecycle ------------------------------------------------------
    def init_state(self, seed: int = 42):
        B = min(self.params.batch_size, 4)
        example = {
            "points": jnp.zeros((B, self.cfg.num_points, 3), jnp.float32),
            "pmask": jnp.ones((B, self.cfg.num_points), bool),
            "positives_mask": jnp.zeros((B, B), bool),
            "negatives_mask": jnp.zeros((B, B), bool),
        }
        qkv_init = getattr(self.params.model_params, "qkv_init", None)
        self.state = init_train_state(self.model, self.tx,
                                      jax.random.PRNGKey(seed), example,
                                      use_ema=self.use_ema,
                                      qkv_init=qkv_init)
        n = param_count(self.state.params)
        print(f"Model: {self.cfg.model}  parameters: {n}")
        if self.params.verbose:
            from hotformerloc_tpu.utils.profiling import print_info
            print_info(self.cfg.model, self.state.params, depth=2)
        return self.state

    def ckpt_path(self, tag: str) -> str:
        return os.path.join(self.weights_dir,
                            f"{self.model_name}_{tag}.ckpt")

    def _extra_meta(self) -> Dict:
        return {"wandb_run_id": getattr(self, "wandb_run_id", None),
                "sampler_batch_size": int(self.train_sampler.batch_size)}

    def resume(self, path: str):
        if self.state is None:
            self.init_state()
        self.state, epoch, best, extra = load_checkpoint(path, self.state)
        self.start_epoch = epoch + 1
        self.best_metric = best
        # Restore non-array context (reference trainer.py:74-90):
        # dynamic-batch-expansion state and the wandb run id for
        # logging continuity (:130-144,383-391).
        bs = int(extra.get("sampler_batch_size", 0))
        if bs > 0:
            self.train_sampler.batch_size = bs
        self.wandb_run_id = extra.get("wandb_run_id") or None
        print(f"Resumed from {path} at epoch {epoch}"
              + (f" (batch_size={bs})" if bs else ""))

    def embed_fn(self, points, pmask):
        return self._embed(self.state, points, pmask)

    # -- loop -----------------------------------------------------------
    def train(self, seed: int = 42):
        p = self.params
        if self.state is None:
            self.init_state(seed)
        self.wandb_run_id = self.logger.ensure_run(
            {k: v for k, v in vars(p).items()
             if isinstance(v, (int, float, str, bool, type(None)))},
            run_id=getattr(self, "wandb_run_id", None),
            name=self.model_name) or getattr(self, "wandb_run_id", None)
        rng = jax.random.PRNGKey(seed)
        mesa_start = int(p.epochs * p.mesa_start_ratio)
        for epoch in range(self.start_epoch, p.epochs + 1):
            t0 = time.time()
            step_fn = self.train_step
            if self.train_step_mesa is not None and epoch > mesa_start:
                step_fn = self.train_step_mesa
            agg: Dict[str, list] = {}
            nbatches = 0
            for batch in self.train_loader:
                rng, sub = jax.random.split(rng)
                sbatch = make_global_batch(self.mesh, batch)
                self.state, stats = step_fn(self.state, sbatch, sub)
                for k, v in stats.items():
                    agg.setdefault(k, []).append(float(v))
                nbatches += 1
            epoch_stats = {k: float(np.mean(v)) for k, v in agg.items()}
            epoch_stats.update(epoch=epoch, phase="train",
                               time=time.time() - t0, batches=nbatches,
                               batch_size=self.train_sampler.batch_size)
            self.logger.log(epoch_stats)
            loss_s = epoch_stats.get("loss", float("nan"))
            print(f"epoch {epoch}: loss={loss_s:.4f} "
                  f"({nbatches} batches, {epoch_stats['time']:.1f}s)",
                  flush=True)

            if self.val_loader is not None:
                vagg: Dict[str, list] = {}
                for batch in self.val_loader:
                    sbatch = make_global_batch(self.mesh, batch)
                    vstats = self.eval_step(self.state, sbatch)
                    for k, v in vstats.items():
                        vagg.setdefault(k, []).append(float(v))
                vals = {f"val_{k}": float(np.mean(v))
                        for k, v in vagg.items()}
                vals.update(epoch=epoch, phase="val")
                self.logger.log(vals)

            if not p.debug:
                save_checkpoint(self.ckpt_path("latest"), self.state, epoch,
                                self.best_metric, self._extra_meta())
                if p.save_freq and epoch % p.save_freq == 0:
                    save_checkpoint(self.ckpt_path(f"e{epoch}"), self.state,
                                    epoch, self.best_metric,
                                    self._extra_meta())

            if p.eval_freq and epoch % p.eval_freq == 0:
                try:
                    from hotformerloc_tpu.evaluation.evaluate import evaluate
                    stats = evaluate(self.embed_fn, p, debug=p.debug)
                    ar1 = float(stats["average"]["ave_recall"][0])
                    self.logger.log({"epoch": epoch, "phase": "eval",
                                     "avg_AR1": ar1})
                    if ar1 > self.best_metric and not p.debug:
                        self.best_metric = ar1
                        save_checkpoint(self.ckpt_path("best"), self.state,
                                        epoch, self.best_metric,
                                        self._extra_meta())
                except FileNotFoundError as e:
                    print(f"[WARN] eval skipped: {e}")

            # preemption: checkpoint + requeue exit (trainer.py:111-128)
            if self.preempted:
                from hotformerloc_tpu.training.elastic import \
                    maybe_requeue_exit
                maybe_requeue_exit(self, epoch)

            # dynamic batch expansion (trainer.py:506-512)
            if p.batch_expansion_th is not None and \
                    "num_non_zero_triplets" in epoch_stats:
                nzr = (epoch_stats["num_non_zero_triplets"]
                       / max(epoch_stats.get("num_triplets", 1.0), 1.0))
                if nzr < p.batch_expansion_th:
                    if self.train_sampler.expand_batch():
                        print(f"Batch expanded to "
                              f"{self.train_sampler.batch_size}")

        if not p.debug:
            save_checkpoint(self.ckpt_path("final"), self.state,
                            p.epochs, self.best_metric,
                            self._extra_meta())
        return self.state
