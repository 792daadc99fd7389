"""End-to-end numerical parity against the REAL reference model.

The torch reference (/root/reference/models/*) is instantiated through
the CPU octree harness (hotformerloc_tpu/tools/ref_harness.py), its
actual ``state_dict()`` is run through the weight converter, and
descriptors for identical clouds are compared between the two stacks.

This is the round-1 review's top ask: converter key names come from a
real ``model.state_dict()`` (not synthesized), and the descriptor diff
validates layer wiring, attention math, masking, ADaPE stats, pooling,
and every transpose/tap-order assumption in the converter.

Caveat (stated per the review): ocnn itself cannot be installed offline,
so the torch side runs on the harness's own octree engine (an
independent numpy/torch implementation of the ocnn API slice; see
ref_harness.py docstring). Octree-semantics assumptions are covered
separately by tests/test_octree_core.py goldens.

The reference packs the whole batch into one ragged node list, so its
descriptors depend on batch packing; B=1 per cloud is its canonical
value, which our per-sample static layout must reproduce for any B.
"""
import numpy as np
import pytest

# Heavy-compile file: excluded from the fast core (pytest -m "not slow") — loads torch reference + full-model compiles.
pytestmark = pytest.mark.slow


torch = pytest.importorskip("torch")

from hotformerloc_tpu.config.params import parse_model_config
from hotformerloc_tpu.tools import ref_harness
from hotformerloc_tpu.tools.convert_reference_weights import (
    Converter, convert_state_dict, validate_against_model)

REF_CFG = {
    "oxford": ("/root/reference/models/hotformerloc_oxford_cfg.txt",
               "configs/oxford_model.txt", 9),
    # wild-places: depth 7, no ADaPE (exercises the ADaPE-off path)
    "wild-places": ("/root/reference/models/hotformerloc_wild-places_cfg.txt",
                    "configs/wild-places_model.txt", 7),
}


def _clouds(n: int, pts: int = 4096, seed: int = 0):
    """Half uniform noise, half clustered blobs (realistic occupancy)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        if i % 2 == 0:
            c = rng.uniform(-0.9, 0.9, (pts, 3))
        else:
            centres = rng.uniform(-0.7, 0.7, (8, 3))
            c = (centres[rng.integers(0, 8, pts)]
                 + rng.normal(0, 0.08, (pts, 3)))
        out.append(np.clip(c, -0.999, 0.999).astype(np.float32))
    return out


@pytest.fixture(scope="module", params=list(REF_CFG))
def ref_setup(request):
    ref_cfg, our_cfg, depth = REF_CFG[request.param]
    torch.manual_seed(0)
    model, _ = ref_harness.load_reference_model(ref_cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    mp = parse_model_config(our_cfg, octree_depth=depth, num_points=4096)
    return request.param, model, sd, mp.config, depth


def test_converter_consumes_every_real_key(ref_setup):
    """Every key of the real state_dict must be mapped (the round-1
    converter silently assumed key names; now they are ground truth)."""
    _, _, sd, cfg, _ = ref_setup
    cv = Converter(sd, cfg)
    cv.convert()
    unused = sorted(k for k in cv.sd if k not in cv.used)
    assert unused == [], f"unmapped reference params: {unused[:10]}"
    validate_against_model(cv.out, cfg)


def test_param_count_delta_is_exactly_zero_bias_padding(ref_setup):
    """Converted tree == reference params + zero-filled biases for the
    bias-less ocnn convs (PatchEmbed stem, octformer_backbone.py:430-437)."""
    _, model, sd, cfg, _ = ref_setup
    import jax
    params = convert_state_dict(sd, cfg)
    n_ref = sum(int(np.prod(v.shape)) for v in sd.values())
    n_ours = sum(v.size for v in jax.tree_util.tree_leaves(params))
    stem_out_ch = []
    chans = [int(cfg.channels[0] * 2 ** i) for i in range(-cfg.stem_down, 1)]
    for i in range(cfg.stem_down):
        stem_out_ch += [chans[i], chans[i + 1]]    # conv_i, down_i
    stem_out_ch.append(cfg.channels[0])            # proj
    assert n_ours - n_ref == sum(stem_out_ch)


def test_descriptor_parity(ref_setup):
    """cosine(reference, converted-ours) ~ 1 on identical clouds."""
    import jax.numpy as jnp

    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc

    name, model, sd, cfg, depth = ref_setup
    params = convert_state_dict(sd, cfg)
    clouds = _clouds(4)
    ref = ref_harness.reference_descriptors(model, clouds, depth=depth)

    ours_model = HOTFormerLoc(cfg, dtype=jnp.float32)
    pts = jnp.stack([jnp.asarray(c) for c in clouds])
    out = ours_model.apply({"params": params}, pts,
                           jnp.ones(pts.shape[:2], bool), deterministic=True)
    ours = np.asarray(out["global"])

    assert np.all(np.isfinite(ours)) and np.all(np.isfinite(ref))
    # both sides L2-normalised -> cosine is a plain dot product
    cos = (ref * ours).sum(1)
    maxdiff = np.abs(ref - ours).max()
    assert cos.min() >= 0.9999, (name, cos, maxdiff)
    assert maxdiff <= 1e-4, (name, cos, maxdiff)
