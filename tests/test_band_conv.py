"""Differential tests for the banded Pallas conv path
(ops/pallas/band_conv.py) against the flat-gather reference ops —
the kernel-test discipline of the reference's
libs/dwconv/test/test_octree_dwconv.py: golden implementation +
allclose at several API levels (raw op, gradients, full model).

CPU runs use interpret mode; the kernels themselves are chip-validated
by tools/gather_bench.py (docs/GATHER_AB.json).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.ops.conv import (_conv_fwd_impl, _dwconv_fwd_impl,
                                       octree_conv, octree_dwconv)
from hotformerloc_tpu.ops.pallas.band_conv import (BandTables, _band_loc,
                                                   band_viable, banded_conv,
                                                   banded_dwconv,
                                                   build_band_tables)

S, HR = 64, 128


def synth_table(B=2, N=512, K=27, far_frac=0.01, seed=0):
    """z-order-local neighbour table with far jumps and -1 holes."""
    rng = np.random.default_rng(seed)
    node = np.arange(N)
    neigh = node[None, :, None] + rng.integers(-40, 40, (B, N, K))
    far = rng.random((B, N, K)) < far_frac
    neigh = np.where(far, rng.integers(0, N, (B, N, K)), neigh)
    neigh = np.where((neigh < 0) | (neigh >= N), -1, neigh)
    neigh = np.where(rng.random((B, N, K)) < 0.1, -1, neigh)
    return jnp.asarray(neigh.astype(np.int32))


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(1)
    B, N, C = 2, 512, 32
    nj = synth_table(B, N)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)
    bt = build_band_tables(nj, S, HR)
    loc = _band_loc(nj, S, HR)
    return nj, x, bt, loc


class TestBandTables:
    def test_escape_set_complete(self, fixture):
        """Every valid tap is either in-band (loc < W) or covered by a
        hard node's escape row."""
        nj, x, bt, loc = fixture
        W = S + 2 * HR
        nj_, loc_ = np.asarray(nj), np.asarray(loc)
        esc = (nj_ >= 0) & (loc_ >= W)
        assert int(np.asarray(bt.overflow).sum()) == 0
        hard_nodes = {(b, int(n)) for b in range(nj_.shape[0])
                      for n in np.asarray(bt.hard_idx)[b] if n >= 0}
        b_ids, n_ids, _ = np.nonzero(esc)
        for b, n in zip(b_ids, n_ids):
            assert (b, int(n)) in hard_nodes

    def test_hard_pos_inverts_hard_idx(self, fixture):
        nj, x, bt, loc = fixture
        hi, hp = np.asarray(bt.hard_idx), np.asarray(bt.hard_pos)
        for b in range(hi.shape[0]):
            for e, n in enumerate(hi[b]):
                if n >= 0:
                    assert hp[b, n] == e
            covered = set(hi[b][hi[b] >= 0])
            for n in range(hp.shape[1]):
                if hp[b, n] >= 0:
                    assert n in covered

    def test_overflow_counted(self):
        nj = synth_table(1, 512, far_frac=0.5, seed=3)
        bt = build_band_tables(nj, S, HR, cap=8)
        assert int(np.asarray(bt.overflow).sum()) > 0


class TestDwconv:
    def test_forward_matches_flat(self, fixture):
        nj, x, bt, loc = fixture
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(0, 0.2, (27, x.shape[-1])), jnp.float32)
        ref = np.asarray(_dwconv_fwd_impl(x, nj, w))
        out = np.asarray(banded_dwconv(x, loc, w, bt, True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_grads_match_flat(self, fixture):
        nj, x, bt, loc = fixture
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(0, 0.2, (27, x.shape[-1])), jnp.float32)

        def f_ref(x, w):
            return jnp.sum(jnp.sin(octree_dwconv(x, nj, w)))

        def f_band(x, w):
            return jnp.sum(jnp.sin(banded_dwconv(x, loc, w, bt, True)))

        gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
        gb = jax.grad(f_band, argnums=(0, 1))(x, w)
        for a, b in zip(gr, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)


class TestConv:
    def test_forward_matches_flat(self, fixture):
        nj, x, bt, loc = fixture
        rng = np.random.default_rng(4)
        C, O = x.shape[-1], 48
        w = jnp.asarray(rng.normal(0, 0.2, (27, C, O)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (O,)), jnp.float32)
        ref = np.asarray(_conv_fwd_impl(x, nj, w, b))
        out = np.asarray(banded_conv(x, loc, w, b, bt, True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_grads_match_flat(self, fixture):
        nj, x, bt, loc = fixture
        rng = np.random.default_rng(5)
        C, O = x.shape[-1], 48
        w = jnp.asarray(rng.normal(0, 0.2, (27, C, O)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (O,)), jnp.float32)

        def f_ref(x, w, b):
            return jnp.sum(jnp.sin(octree_conv(x, nj, w, b)))

        def f_band(x, w, b):
            return jnp.sum(jnp.sin(banded_conv(x, loc, w, b, bt, True)))

        gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
        gb = jax.grad(f_band, argnums=(0, 1, 2))(x, w, b)
        for a, b_ in zip(gr, gb):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=1e-4, atol=2e-4)


class TestRealTables:
    def test_real_octree_table(self):
        """Banded == flat on a neighbour table from an actual on-device
        octree plan (real z-order locality + real escapes)."""
        from hotformerloc_tpu.models.config import tiny_test_config
        from hotformerloc_tpu.octree.build import build_batched_octree
        from hotformerloc_tpu.ops.plan import build_plan
        cfg = tiny_test_config()
        rng = np.random.default_rng(6)
        pts = jnp.asarray(rng.uniform(-1, 1, (2, cfg.num_points, 3))
                          .astype(np.float32))
        octree = build_batched_octree(pts, jnp.ones(pts.shape[:2], bool),
                                      cfg.octree_depth, cfg.min_depth,
                                      cfg.resolve_capacities())
        plan = build_plan(octree, band_depths=(cfg.octree_depth,),
                          band_tile=S, band_halo=HR)
        ctx = plan.level_ctx(cfg.octree_depth)
        assert ctx.band is not None
        N = ctx.neigh.shape[1]
        assert band_viable(N, 32, S)
        x = jnp.asarray(rng.normal(0, 1, (2, N, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.2, (27, 32)), jnp.float32)
        loc = _band_loc(ctx.neigh, S, HR)
        ref = np.asarray(_dwconv_fwd_impl(x, ctx.neigh, w))
        out = np.asarray(banded_dwconv(x, loc, w, ctx.band, True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
class TestModelIntegration:
    def test_model_band_matches_flat(self):
        """Full tiny model, identical params: banded vs flat descriptors.

        Depth/capacity tweaked so a real banded level exists (stem conv
        + CPE at depth 6 with 64-divisible capacity)."""
        from hotformerloc_tpu.models.config import tiny_test_config
        from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
        kw = dict(octree_depth=7, num_points=768,
                  dense_cpe_max_depth=4, use_pallas_attn=False)
        cfg_f = tiny_test_config(use_band_conv=False, **kw)
        cfg_b = tiny_test_config(use_band_conv=True, band_tile=S,
                                 band_halo=HR, **kw)
        assert cfg_b.band_depths(), "no banded depth in test config"
        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.uniform(-1, 1, (2, cfg_f.num_points, 3))
                          .astype(np.float32))
        mask = jnp.ones(pts.shape[:2], bool)
        m_f, m_b = HOTFormerLoc(cfg_f), HOTFormerLoc(cfg_b)
        params = m_f.init(jax.random.PRNGKey(0), pts, mask)
        gf = np.asarray(m_f.apply(params, pts, mask)["global"])
        gb = np.asarray(m_b.apply(params, pts, mask)["global"])
        np.testing.assert_allclose(gb, gf, rtol=1e-3, atol=1e-4)


def test_escape_capacity_covers_realistic_clouds():
    """Regression guard for the round-5 parity break: the default
    escape capacities (E = N//4 nodes, 16 slots/node) must hold ALL
    escaped taps of realistic clouds at the flagship coarse depths —
    overflow there silently degrades conv exactness (the old N//8 node
    cap lost ~5e-2 of descriptor cosine on these exact clouds)."""
    import sys
    sys.path.insert(0, "tests")
    from test_reference_parity import _clouds

    from hotformerloc_tpu.config.params import parse_model_config
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.ops.plan import build_plan

    cfg = parse_model_config("configs/oxford_model.txt", octree_depth=9,
                             num_points=4096).config
    pts = jnp.stack([jnp.asarray(c) for c in _clouds(4)])
    oc = build_batched_octree(pts, jnp.ones(pts.shape[:2], bool), 9,
                              9 - len(cfg.capacities) + 1, cfg.capacities)
    plan = build_plan(oc, cfg.band_depths(), cfg.band_tile, cfg.band_halo)
    for d in cfg.band_depths():
        bt = plan.bands[oc.level(d)]
        assert int(np.asarray(bt.overflow).sum()) == 0, f"depth {d}"
