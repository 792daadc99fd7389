"""Tests for the reference-weights converter: synthetic reference
state_dict -> flax params, exact shape coverage, working forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy-compile file: excluded from the fast core (pytest -m "not slow") — torch reference import + full-model compile.
pytestmark = pytest.mark.slow


from hotformerloc_tpu.models.config import tiny_test_config
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
from hotformerloc_tpu.tools.convert_reference_weights import (
    convert_state_dict, synthesize_reference_state_dict,
    validate_against_model)


@pytest.fixture(scope="module")
def cfg():
    # PyramidAttnPoolMixer + ADaPE cov + layernorm = the shipped shape
    return tiny_test_config()


class TestConverter:
    def test_full_coverage_and_shapes(self, cfg):
        sd = synthesize_reference_state_dict(cfg)
        params = convert_state_dict(dict(sd), cfg)
        validate_against_model(params, cfg)  # raises on any mismatch

    def test_all_reference_keys_consumed(self, cfg, capsys):
        sd = synthesize_reference_state_dict(cfg)
        convert_state_dict(dict(sd), cfg)
        assert "WARNING" not in capsys.readouterr().out

    def test_forward_with_converted_params(self, cfg):
        sd = synthesize_reference_state_dict(cfg)
        params = convert_state_dict(dict(sd), cfg)
        model = HOTFormerLoc(cfg)
        pts = jnp.asarray(np.random.default_rng(0).uniform(
            -0.9, 0.9, (2, cfg.num_points, 3)).astype(np.float32))
        mask = jnp.ones(pts.shape[:2], bool)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        out = model.apply({"params": params}, pts, mask)["global"]
        assert out.shape == (2, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_linear_transpose_semantics(self, cfg):
        """qkv kernels must be transposed torch weights."""
        sd = synthesize_reference_state_dict(cfg)
        params = convert_state_dict(dict(sd), cfg)
        w_ref = sd["backbone.backbone.octf_stage.0.blocks.0.attention.qkv.weight"]
        w_new = params["backbone"]["octf_stage0"]["block0"][
            "WindowAttention_0"]["qkv"]["kernel"]
        np.testing.assert_array_equal(w_new, w_ref.T)

    def test_stacked_scan_params(self, cfg):
        """HOSA block i params land at axis-0 index i of the scanned
        iteration tree."""
        sd = synthesize_reference_state_dict(cfg)
        params = convert_state_dict(dict(sd), cfg)
        nb = cfg.num_blocks[-1]
        stacked = params["backbone"]["hotf_stage"]["iter"]["hosa0"][
            "Mlp_0"]["fc1"]["kernel"]
        assert stacked.shape[0] == nb
        for i in range(nb):
            ref = sd[f"backbone.backbone.hotf_stage.hosa_blocks.0.{i}.mlp.fc1.weight"]
            np.testing.assert_array_equal(stacked[i], ref.T)

    def test_missing_key_raises(self, cfg):
        sd = synthesize_reference_state_dict(cfg)
        del sd["backbone.backbone.patch_embed.proj.conv.weights"]
        with pytest.raises(KeyError):
            convert_state_dict(sd, cfg)

    def test_params_only_checkpoint_roundtrip(self, cfg, tmp_path):
        """Converted (params-only) orbax checkpoints load through the
        eval path's fallback."""
        import os

        import orbax.checkpoint as ocp

        from hotformerloc_tpu.losses.losses import make_loss
        from hotformerloc_tpu.training.optim import (lr_schedule,
                                                     make_optimizer)
        from hotformerloc_tpu.training.step import init_train_state
        sd = synthesize_reference_state_dict(cfg)
        params = convert_state_dict(dict(sd), cfg)
        path = os.path.abspath(str(tmp_path / "conv_ckpt"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": params}, force=True)
        ckptr.wait_until_finished()

        model = HOTFormerLoc(cfg)
        tx = make_optimizer("adam", lr_schedule(1e-3, 1, 1))
        example = {"points": jnp.zeros((2, cfg.num_points, 3), jnp.float32),
                   "pmask": jnp.ones((2, cfg.num_points), bool)}
        state = init_train_state(model, tx, jax.random.PRNGKey(0), example)
        restored = ckptr.restore(path,
                                 {"params": jax.device_get(state.params)})
        state = state.replace(params=restored["params"])
        got = state.params["pooling"]["attpool0"]["query"]
        np.testing.assert_allclose(np.asarray(got),
                                   sd["pooling.pooling.attpool.0.query"],
                                   rtol=1e-6)
