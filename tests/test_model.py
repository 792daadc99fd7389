"""End-to-end model tests: forward shape, determinism, masking invariance.

The masking-invariance test is the key correctness property of the
static-capacity layout: adding padding (invalid) nodes must never change
a sample's descriptor.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy-compile file: excluded from the fast core (pytest -m "not slow") — full tiny-model compiles (pallas interpret).
pytestmark = pytest.mark.slow


from hotformerloc_tpu.models.config import tiny_test_config
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc, param_count


def _points(rng, B, P, scale=1.0):
    return rng.uniform(-scale, scale, size=(B, P, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_test_config()
    model = HOTFormerLoc(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(_points(rng, 2, cfg.num_points))
    mask = jnp.ones(pts.shape[:2], dtype=bool)
    params = model.init(jax.random.PRNGKey(0), pts, mask)
    return cfg, model, params


class TestForward:
    def test_output_shape_and_norm(self, model_and_params):
        cfg, model, params = model_and_params
        rng = np.random.default_rng(1)
        pts = jnp.asarray(_points(rng, 3, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        out = model.apply(params, pts, mask)
        g = np.asarray(out["global"])
        assert g.shape == (3, cfg.output_dim)
        assert np.all(np.isfinite(g))
        np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, rtol=1e-5)

    def test_jit_deterministic(self, model_and_params):
        cfg, model, params = model_and_params
        rng = np.random.default_rng(2)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        f = jax.jit(lambda p, x, m: model.apply(p, x, m))
        a = np.asarray(f(params, pts, mask)["global"])
        b = np.asarray(f(params, pts, mask)["global"])
        np.testing.assert_array_equal(a, b)

    def test_padding_invariance(self, model_and_params):
        # A sample evaluated alone must produce the same descriptor as
        # the same sample with extra masked-out points.
        cfg, model, params = model_and_params
        rng = np.random.default_rng(3)
        P = cfg.num_points
        pts_real = _points(rng, 1, P // 2)
        pts_a = np.concatenate([pts_real,
                                np.zeros((1, P - P // 2, 3), np.float32)], 1)
        mask_a = np.concatenate([np.ones((1, P // 2), bool),
                                 np.zeros((1, P - P // 2), bool)], 1)
        # Same real points but the padding region filled with garbage.
        pts_b = np.concatenate([pts_real, _points(rng, 1, P - P // 2)], 1)
        ga = np.asarray(model.apply(params, jnp.asarray(pts_a),
                                    jnp.asarray(mask_a))["global"])
        gb = np.asarray(model.apply(params, jnp.asarray(pts_b),
                                    jnp.asarray(mask_a))["global"])
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)

    def test_batch_independence(self, model_and_params):
        # Per-sample layout: descriptors must not depend on batch peers.
        cfg, model, params = model_and_params
        rng = np.random.default_rng(4)
        pts = _points(rng, 2, cfg.num_points)
        mask = np.ones(pts.shape[:2], bool)
        both = np.asarray(model.apply(params, jnp.asarray(pts),
                                      jnp.asarray(mask))["global"])
        solo = np.asarray(model.apply(params, jnp.asarray(pts[:1]),
                                      jnp.asarray(mask[:1]))["global"])
        np.testing.assert_allclose(both[0], solo[0], rtol=1e-4, atol=1e-5)

    def test_train_mode_stochastic(self, model_and_params):
        cfg, model, params = model_and_params
        rng = np.random.default_rng(5)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        rngs = {"dropout": jax.random.PRNGKey(1),
                "droppath": jax.random.PRNGKey(2)}
        a = model.apply(params, pts, mask, deterministic=False, train=False,
                        rngs=rngs)["global"]
        rngs2 = {"dropout": jax.random.PRNGKey(3),
                 "droppath": jax.random.PRNGKey(4)}
        b = model.apply(params, pts, mask, deterministic=False, train=False,
                        rngs=rngs2)["global"]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_param_count_reasonable(self, model_and_params):
        cfg, model, params = model_and_params
        n = param_count(params)
        assert 1e5 < n < 5e7

    def test_gradients_finite(self, model_and_params):
        cfg, model, params = model_and_params
        rng = np.random.default_rng(6)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)

        def loss(p):
            g = model.apply(p, pts, mask)["global"]
            return jnp.sum(g * g)

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # at least 90% of leaves get nonzero gradient signal
        nz = [np.any(np.asarray(l) != 0) for l in leaves]
        assert np.mean(nz) > 0.9


class TestAblations:
    """Every config ablation knob the reference exposes must produce a
    working forward pass (misc/utils.py:15-101 schema; §2.9 SURVEY.md)."""

    VARIANTS = {
        "disable_rt": dict(disable_rt=True,
                           pooling="PyramidAttnPoolMixer"),
        "disable_rpe": dict(disable_rpe=True),
        "xcpe": dict(xcpe=True),
        "layer_scale": dict(layer_scale=1e-5),
        "no_adape": dict(adape_mode=None),
        "adape_pos": dict(adape_mode="pos"),
        "adape_var": dict(adape_mode="var"),
        "powernorm": dict(conv_norm="powernorm"),
        "batchnorm": dict(conv_norm="batchnorm"),
        "rt_propagation": dict(rt_propagation=True,
                               rt_propagation_scale=0.5),
        "no_stem_down": dict(downsample_input_embeddings=False,
                             octree_depth=5),
        "rt_size2": dict(rt_size=2),
        "octf_use_rt": dict(octf_use_rt=True),
    }

    @pytest.mark.parametrize("name", sorted(VARIANTS))
    def test_forward_variant(self, name):
        cfg = tiny_test_config(**self.VARIANTS[name])
        model = HOTFormerLoc(cfg)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        params = model.init(jax.random.PRNGKey(0), pts, mask)
        out = model.apply(params, pts, mask)["global"]
        assert out.shape == (2, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))

    @pytest.mark.parametrize("pooling", [
        "OctGeM", "PyramidOctGeM", "PyramidOctGeMgc",
        "PyramidAttnPoolMixer", "AttnPoolMixer", "AttnPoolGeM"])
    def test_pooling_heads(self, pooling):
        kw = {"pooling": pooling}
        cfg = tiny_test_config(**kw)
        model = HOTFormerLoc(cfg)
        rng = np.random.default_rng(2)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        params = model.init(jax.random.PRNGKey(0), pts, mask)
        out = model.apply(params, pts, mask)["global"]
        assert out.shape == (2, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))


class TestConfigValidation:
    def test_rt_size_must_divide_patch(self):
        with pytest.raises(ValueError, match="divisible"):
            tiny_test_config(rt_size=3)  # patch_size 8 % 3 != 0

    def test_input_feature_validation(self):
        with pytest.raises(ValueError, match="invalid input features"):
            tiny_test_config(input_features="PX")

    def test_input_feature_normals_end_to_end(self):
        # 'N' (reference models/model_factory.py:9-23): per-leaf mean of
        # per-point normals, forwarded through the full model.
        cfg = tiny_test_config(input_features="NP")
        model = HOTFormerLoc(cfg)
        rng = np.random.default_rng(8)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        nrm = rng.normal(0, 1, (2, cfg.num_points, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = jnp.asarray(nrm.astype(np.float32))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        with pytest.raises(ValueError, match="normals"):
            model.init(jax.random.PRNGKey(0), pts, mask)
        params = model.init(jax.random.PRNGKey(0), pts, mask, normals=nrm)
        out = model.apply(params, pts, mask, normals=nrm)["global"]
        assert out.shape == (2, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_leaf_normal_is_per_octant_mean(self):
        from hotformerloc_tpu.models.hotformerloc import input_features
        from hotformerloc_tpu.octree.build import build_batched_octree
        from hotformerloc_tpu.octree import morton
        rng = np.random.default_rng(9)
        pts = rng.uniform(-1, 1, (1, 200, 3)).astype(np.float32)
        nrm = rng.normal(0, 1, (1, 200, 3)).astype(np.float32)
        mask = np.ones((1, 200), dtype=bool)
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask),
                                  4, 2, normals=jnp.asarray(nrm))
        feats = np.asarray(input_features(oc, "N"))
        cnt = int(oc.count(4)[0])
        keys = np.asarray(oc.key(4)[0][:cnt])
        grid = np.asarray(morton.points_to_grid(jnp.asarray(pts[0]), 4))
        pkeys = np.asarray(morton.encode(jnp.asarray(grid)))
        for i in (0, cnt // 2, cnt - 1):
            sel = pkeys == keys[i]
            np.testing.assert_allclose(feats[0, i], nrm[0][sel].mean(0),
                                       rtol=1e-5, atol=1e-6)
        assert np.all(feats[0, cnt:] == 0)

    def test_rt_size2_uses_rt_pooling(self):
        """rt_size=2 doubles the relay-token count; the RT pooling head
        must consume the widened rt_comb."""
        cfg = tiny_test_config(rt_size=2, pooling="AttnPoolMixer")
        model = HOTFormerLoc(cfg)
        rng = np.random.default_rng(5)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        params = model.init(jax.random.PRNGKey(0), pts, mask)
        out = model.apply(params, pts, mask)["global"]
        assert out.shape == (2, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))


class TestQkvInit:
    """qkv_init modes re-initialise only qkv kernels
    (reference models/hotformerloc_backbone.py:785-805)."""

    def _params(self):
        cfg = tiny_test_config()
        model = HOTFormerLoc(cfg)
        rng = np.random.default_rng(6)
        pts = jnp.asarray(_points(rng, 2, cfg.num_points))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        return model.init(jax.random.PRNGKey(0), pts, mask)["params"]

    @staticmethod
    def _qkv_and_other(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        qkv, other = [], []
        for path, leaf in flat:
            names = [str(getattr(p, "key", p)) for p in path]
            (qkv if any("qkv" in n for n in names)
             and names[-1] == "kernel" else other).append((names, leaf))
        return qkv, other

    def test_torch_default_noop(self):
        from hotformerloc_tpu.training.step import apply_qkv_init
        params = self._params()
        out = apply_qkv_init(params, jax.random.PRNGKey(1), "torch_default")
        assert out is params

    @pytest.mark.parametrize("mode", [
        "trunc_normal,0.5", "xavier_uniform", "xavier_normal",
        "kaiming_uniform", "kaiming_normal"])
    def test_modes_touch_only_qkv(self, mode):
        from hotformerloc_tpu.training.step import apply_qkv_init
        params = self._params()
        out = apply_qkv_init(params, jax.random.PRNGKey(1), mode)
        q0, o0 = self._qkv_and_other(params)
        q1, o1 = self._qkv_and_other(out)
        assert len(q0) > 0
        changed = [not np.allclose(a[1], b[1]) for a, b in zip(q0, q1)]
        assert all(changed)
        for (_, a), (_, b) in zip(o0, o1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trunc_normal_std(self):
        from hotformerloc_tpu.training.step import apply_qkv_init
        params = self._params()
        out = apply_qkv_init(params, jax.random.PRNGKey(1),
                             "trunc_normal,0.5")
        q1, _ = self._qkv_and_other(out)
        big = max(q1, key=lambda kv: kv[1].size)[1]
        s = float(np.std(np.asarray(big)))
        assert 0.3 < s < 0.6  # ~0.5 modulo truncation

    def test_invalid_mode_raises(self):
        from hotformerloc_tpu.training.step import apply_qkv_init
        with pytest.raises(ValueError, match="Invalid qkv_init"):
            apply_qkv_init(self._params(), jax.random.PRNGKey(1), "bogus")
