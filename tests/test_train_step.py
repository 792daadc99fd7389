"""Train-step tests: loss decreases, multistage == single-pass grads,
data-parallel mesh equivalence on the 8-device virtual CPU mesh.

The DP test is the golden-value collective test mandated by SURVEY.md §4:
sharded global-batch mining must equal the single-device result.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy-compile file: excluded from the fast core (pytest -m "not slow") — multistage/step compiles dominate suite wall-time.
pytestmark = pytest.mark.slow


from hotformerloc_tpu.losses.losses import make_loss
from hotformerloc_tpu.models.config import tiny_test_config
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
from hotformerloc_tpu.parallel.mesh import make_mesh, shard_batch
from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
from hotformerloc_tpu.training.step import (StepConfig, TrainState,
                                            init_train_state,
                                            make_embed_step, make_train_step)


def synthetic_batch(rng, B, P, k=2):
    """k=2 positive pairs: pair members are jittered copies of a base
    cloud, so the metric objective is learnable."""
    base = rng.uniform(-0.8, 0.8, size=(B // k, P, 3)).astype(np.float32)
    pts = np.repeat(base, k, axis=0)
    pts = pts + rng.normal(0, 0.01, size=pts.shape).astype(np.float32)
    groups = np.repeat(np.arange(B // k), k)
    pos = (groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)
    neg = groups[:, None] != groups[None]
    return {
        "points": jnp.asarray(pts),
        "pmask": jnp.ones((B, P), dtype=bool),
        "positives_mask": jnp.asarray(pos),
        "negatives_mask": jnp.asarray(neg),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(drop_path=0.0, num_points=256)
    model = HOTFormerLoc(cfg)
    loss_fn = make_loss("truncatedsmoothap", positives_per_query=1)
    sched = lr_schedule(1e-3, steps_per_epoch=1, epochs=100,
                        warmup_epochs=None, scheduler="constant")
    tx = make_optimizer("adam", sched, weight_decay=1e-4)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 8, cfg.num_points)

    def fresh_state(**kw):
        # train steps donate their input state; every test needs its own
        return init_train_state(model, tx, jax.random.PRNGKey(0), batch,
                                **kw)

    return cfg, model, loss_fn, tx, batch, fresh_state


class TestTrainStep:
    def test_loss_decreases(self, setup):
        cfg, model, loss_fn, tx, batch, fresh_state = setup
        state = fresh_state()
        step = make_train_step(model, tx, loss_fn, StepConfig())
        losses = []
        for i in range(8):
            state, stats = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(stats["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_multistage_matches_single_pass(self, setup):
        cfg, model, loss_fn, tx, batch, fresh_state = setup
        s1 = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=1))
        s4 = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=4))
        r = jax.random.PRNGKey(7)
        st1, stats1 = s1(fresh_state(), batch, r)
        st4, stats4 = s4(fresh_state(), batch, r)
        np.testing.assert_allclose(float(stats1["loss"]),
                                   float(stats4["loss"]), rtol=1e-4)
        # Adam amplifies fp32 grad-summation-order noise on near-zero
        # gradient entries, so compare with a mismatch budget instead of
        # strict elementwise tolerance.
        l1 = jax.tree_util.tree_leaves(st1.params)
        l4 = jax.tree_util.tree_leaves(st4.params)
        total = mismatched = 0
        for a, b in zip(l1, l4):
            a, b = np.asarray(a), np.asarray(b)
            bad = ~np.isclose(a, b, rtol=5e-3, atol=1e-5)
            mismatched += bad.sum()
            total += a.size
            assert np.abs(a - b).max() < 5e-3
        assert mismatched / total < 0.005, f"{mismatched}/{total}"

    def test_ema_updates(self, setup):
        cfg, model, loss_fn, tx, batch, fresh_state = setup
        state = fresh_state(use_ema=True)
        step = make_train_step(model, tx, loss_fn,
                               StepConfig(use_ema=True, ema_decay=0.5,
                                          mesa=0.1))
        p0 = jax.tree_util.tree_leaves(state.ema_params)[0].copy()
        state, stats = step(state, batch, jax.random.PRNGKey(0))
        p1 = jax.tree_util.tree_leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        assert np.isfinite(float(stats["loss"]))


class TestDataParallel:
    def test_dp_matches_single_device(self, setup):
        cfg, model, loss_fn, tx, batch, fresh_state = setup
        assert len(jax.devices()) == 8
        mesh = make_mesh()
        step = make_train_step(model, tx, loss_fn, StepConfig())
        r = jax.random.PRNGKey(3)

        st_a, stats_a = step(fresh_state(), batch, r)

        state_b = fresh_state()
        sbatch = shard_batch(mesh, batch)
        st_b, stats_b = step(state_b, sbatch, r)
        np.testing.assert_allclose(float(stats_a["loss"]),
                                   float(stats_b["loss"]), rtol=1e-5)
        la = jax.tree_util.tree_leaves(st_a.params)
        lb = jax.tree_util.tree_leaves(st_b.params)
        total = mismatched = 0
        for a, b in zip(la, lb):
            a, b = np.asarray(a), np.asarray(b)
            mismatched += (~np.isclose(a, b, rtol=2e-3, atol=1e-5)).sum()
            total += a.size
            assert np.abs(a - b).max() < 5e-3
        assert mismatched / total < 0.005, f"{mismatched}/{total}"

    def test_embed_step_sharded(self, setup):
        cfg, model, loss_fn, tx, batch, fresh_state = setup
        mesh = make_mesh()
        embed = make_embed_step(model)
        state2 = fresh_state()
        sbatch = shard_batch(mesh, batch)
        e = embed(state2, sbatch["points"], sbatch["pmask"])
        e = np.asarray(e)
        assert e.shape == (8, cfg.output_dim)
        np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0,
                                   rtol=1e-5)


class TestSchedules:
    def test_multistep_with_warmup(self):
        s = lr_schedule(1.0, steps_per_epoch=10, epochs=20,
                        scheduler="MultiStepLR", milestones=[10], gamma=0.1,
                        warmup_epochs=5)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(10)) == pytest.approx(0.2)   # epoch 1 of 5 warmup
        assert float(s(50)) == pytest.approx(1.0)   # warmup done
        assert float(s(149)) == pytest.approx(1.0)  # epoch 14 < 5+10
        assert float(s(151)) == pytest.approx(0.1)  # epoch 15 >= 5+10

    def test_cosine(self):
        s = lr_schedule(1.0, 1, 100, scheduler="CosineAnnealingLR",
                        min_lr=0.1, warmup_epochs=None)
        assert float(s(0)) == pytest.approx(1.0)
        assert 0.1 <= float(s(100)) < 0.2

    def test_optimizers_build(self):
        sched = lr_schedule(1e-3, 1, 10)
        for name in ("adam", "adamw", "lamb"):
            tx = make_optimizer(name, sched, weight_decay=1e-4)
            p = {"w": jnp.ones((3,))}
            st = tx.init(p)
            up, _ = tx.update({"w": jnp.ones((3,))}, st, p)
            assert np.isfinite(np.asarray(up["w"])).all()


class TestBatchStats:
    def test_batchnorm_state_updates_in_train_step(self):
        """conv_norm=batchnorm threads mutable batch_stats through the
        jitted train step (running stats must change)."""
        cfg = tiny_test_config(drop_path=0.0, num_points=256,
                               conv_norm="batchnorm")
        model = HOTFormerLoc(cfg)
        loss_fn = make_loss("truncatedsmoothap", positives_per_query=1)
        tx = make_optimizer("adam", lr_schedule(1e-3, 1, 10,
                                                scheduler="constant"))
        batch = synthetic_batch(np.random.default_rng(1), 8,
                                cfg.num_points)
        state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
        assert "batch_stats" in state.model_state
        before = jax.tree_util.tree_map(
            np.asarray, state.model_state["batch_stats"])
        step = make_train_step(model, tx, loss_fn, StepConfig())
        state, stats = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(stats["loss"]))
        after = state.model_state["batch_stats"]
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a)
                                      - np.asarray(b)).max()),
            before, after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
