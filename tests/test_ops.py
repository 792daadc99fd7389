"""Differential tests for octree conv ops and window machinery.

Golden implementations are independent numpy loops mirroring the
reference semantics (CUDA dwconv: libs/dwconv/csrc/dwconv.cu:24-42,
OctreeT windows: models/octree.py:316-356).
"""
import jax
import jax.numpy as jnp
import numpy as np

from hotformerloc_tpu.octree.build import build_batched_octree
from hotformerloc_tpu.octree.neigh import child_table, neigh_table
from hotformerloc_tpu.ops import conv as oc
from hotformerloc_tpu.ops import window as ow


def _fixture(seed=0, B=2, P=400, depth=5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32)
    mask = np.ones((B, P), dtype=bool)
    octree = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask),
                                  depth, 2)
    return rng, octree


def np_conv(x, neigh, w, b=None):
    B, N, _ = x.shape
    K = w.shape[0]
    out = np.zeros((B, N, w.shape[2]), dtype=np.float64)
    bi = np.arange(B)[:, None]
    for k in range(K):
        m = neigh[..., k] >= 0
        g = np.where(m[..., None], x[bi, np.maximum(neigh[..., k], 0)], 0)
        out += g.astype(np.float64) @ w[k].astype(np.float64)
    if b is not None:
        out += b
    return out


class TestConv:
    def test_conv_golden(self):
        rng, octree = _fixture()
        d = 5
        neigh = np.asarray(neigh_table(octree, d, "333"))
        N = octree.cap(d)
        x = rng.standard_normal((2, N, 4)).astype(np.float32)
        w = rng.standard_normal((27, 4, 6)).astype(np.float32) * 0.1
        b = rng.standard_normal((6,)).astype(np.float32)
        got = np.asarray(oc.octree_conv(jnp.asarray(x), jnp.asarray(neigh),
                                        jnp.asarray(w), jnp.asarray(b)))
        np.testing.assert_allclose(got, np_conv(x, neigh, w, b),
                                   rtol=1e-4, atol=1e-4)

    def test_dwconv_golden(self):
        rng, octree = _fixture(1)
        d = 4
        neigh = np.asarray(neigh_table(octree, d, "333"))
        N = octree.cap(d)
        x = rng.standard_normal((2, N, 5)).astype(np.float32)
        w = rng.standard_normal((27, 5)).astype(np.float32) * 0.2
        got = np.asarray(oc.octree_dwconv(jnp.asarray(x), jnp.asarray(neigh),
                                          jnp.asarray(w)))
        expect = np.zeros_like(x)
        bi = np.arange(2)[:, None]
        for k in range(27):
            m = neigh[..., k] >= 0
            g = np.where(m[..., None], x[bi, np.maximum(neigh[..., k], 0)], 0)
            expect += g * w[k]
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_dwconv_grad_matches_numeric(self):
        # autodiff through gather must equal the scatter-adjoint the
        # reference builds by inverting the neighbour table
        # (libs/dwconv/csrc/dwconv.cu:74-97).
        rng, octree = _fixture(2, P=100, depth=4)
        d = 4
        neigh = neigh_table(octree, d, "333")
        N = octree.cap(d)
        x = jnp.asarray(rng.standard_normal((2, N, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((27, 3)).astype(np.float32))

        def f(x, w):
            return jnp.sum(jnp.sin(oc.octree_dwconv(x, neigh, w)))

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        eps = 1e-3
        for idx in [(0, 3, 1), (1, 10, 2)]:
            xp = x.at[idx].add(eps)
            xm = x.at[idx].add(-eps)
            num = (f(xp, w) - f(xm, w)) / (2 * eps)
            np.testing.assert_allclose(gx[idx], num, rtol=1e-2, atol=1e-3)
        wp = w.at[(5, 1)].add(eps)
        wm = w.at[(5, 1)].add(-eps)
        num = (f(x, wp) - f(x, wm)) / (2 * eps)
        np.testing.assert_allclose(gw[5, 1], num, rtol=1e-2, atol=1e-3)

    def test_down_conv_golden(self):
        rng, octree = _fixture(3)
        d = 5
        ch = np.asarray(child_table(octree, d))
        x = rng.standard_normal((2, octree.cap(d), 4)).astype(np.float32)
        w = rng.standard_normal((8, 4, 7)).astype(np.float32) * 0.2
        got = np.asarray(oc.octree_down_conv(jnp.asarray(x), jnp.asarray(ch),
                                             jnp.asarray(w)))
        np.testing.assert_allclose(got, np_conv(x, ch, w), rtol=1e-4,
                                   atol=1e-4)

    def test_deconv_adjoint_of_down_conv(self):
        # octree_deconv with (Cout, Cin)-transposed weights must equal the
        # VJP of octree_down_conv — the relationship the reference encodes
        # with its inverse-neighbour CUDA trick (dwconv.cu:74-97).
        _, octree = _fixture(7)
        rng = np.random.default_rng(7)
        d = 5
        ch = jnp.asarray(np.asarray(child_table(octree, d)))
        parent = octree.parent(d)
        octant = jnp.where(octree.node_valid(d),
                           (octree.key(d) & 7).astype(jnp.int32), 0)
        Np, Nc = octree.cap(d - 1), octree.cap(d)
        x = jnp.asarray(rng.standard_normal((2, Nc, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((8, 4, 6)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, Np, 6)).astype(np.float32))
        _, vjp = jax.vjp(lambda x: oc.octree_down_conv(x, ch, w), x)
        want = np.asarray(vjp(y)[0])
        got = np.asarray(oc.octree_deconv(y, parent, octant,
                                          jnp.transpose(w, (0, 2, 1))))
        # padding children gather parent 0's value but contribute nothing
        # downstream; compare on valid nodes only.
        vm = np.asarray(octree.node_valid(d))[..., None]
        np.testing.assert_allclose(got * vm, want * vm, rtol=1e-4, atol=1e-4)

    def test_conv_custom_vjp_matches_autodiff(self):
        # The scatter-free adjoint (tap-flipped, channel-transposed
        # kernel — ops/conv.py module doc) must equal autodiff through
        # the plain gather formulation.
        rng, octree = _fixture(11, P=200, depth=4)
        d = 4
        neigh = neigh_table(octree, d, "333")
        N = octree.cap(d)
        x = jnp.asarray(rng.standard_normal((2, N, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((27, 4, 5)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((5,)).astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((2, N, 5)).astype(np.float32))

        def ref(x, w, b):                    # autodiff-through-gather
            return oc._conv_fwd_impl(x, neigh, w, b)

        _, vjp = jax.vjp(lambda x, w, b: oc.octree_conv(x, neigh, w, b),
                         x, w, b)
        _, rvjp = jax.vjp(ref, x, w, b)
        for got, want in zip(vjp(cot), rvjp(cot)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_down_conv_custom_vjp_matches_autodiff(self):
        _, octree = _fixture(12, P=300, depth=5)
        rng = np.random.default_rng(12)
        d = 5
        ch = child_table(octree, d)
        parent = octree.parent(d)
        octant = jnp.where(octree.node_valid(d),
                           (octree.key(d) & 7).astype(jnp.int32), 0)
        Np, Nc = octree.cap(d - 1), octree.cap(d)
        x = jnp.asarray(rng.standard_normal((2, Nc, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((8, 4, 6)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((2, Np, 6)).astype(np.float32))
        _, vjp = jax.vjp(
            lambda x, w, b: oc.octree_down_conv(x, ch, w, b, parent, octant),
            x, w, b)
        _, rvjp = jax.vjp(
            lambda x, w, b: oc.octree_down_conv(x, ch, w, b), x, w, b)
        for got, want in zip(vjp(cot), rvjp(cot)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_deconv_custom_vjp_matches_autodiff(self):
        _, octree = _fixture(13, P=300, depth=5)
        rng = np.random.default_rng(13)
        d = 5
        ch = child_table(octree, d)
        parent = octree.parent(d)
        octant = jnp.where(octree.node_valid(d),
                           (octree.key(d) & 7).astype(jnp.int32), 0)
        Np, Nc = octree.cap(d - 1), octree.cap(d)
        x = jnp.asarray(rng.standard_normal((2, Np, 4)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((8, 4, 6)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((2, Nc, 6)).astype(np.float32))
        _, vjp = jax.vjp(
            lambda x, w, b: oc.octree_deconv(x, parent, octant, w, b, ch),
            x, w, b)
        _, rvjp = jax.vjp(
            lambda x, w, b: oc.octree_deconv(x, parent, octant, w, b),
            x, w, b)
        for got, want in zip(vjp(cot), rvjp(cot)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_global_pool(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((3, 16, 5)).astype(np.float32)
        valid = np.zeros((3, 16), dtype=bool)
        valid[0, :4] = True
        valid[1, :16] = True
        valid[2, :1] = True
        got = np.asarray(oc.global_pool(jnp.asarray(x), jnp.asarray(valid)))
        for b, n in [(0, 4), (1, 16), (2, 1)]:
            np.testing.assert_allclose(got[b], x[b, :n].mean(0), rtol=1e-5,
                                       atol=1e-6)


class TestWindows:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        for dil in (1, 4):
            x = jnp.asarray(rng.standard_normal((2, 96, 3)))
            w = ow.data_to_windows(x, 8, dil)
            assert w.shape == (2, 12, 8, 3)
            back = ow.windows_to_data(w, 8, dil)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_dilation_layout(self):
        # With dilation D, window w in block b holds nodes b*K*D + w%D::D
        K, D = 4, 3
        x = jnp.arange(2 * K * D, dtype=jnp.float32).reshape(1, -1, 1)
        w = np.asarray(ow.data_to_windows(x, K, D))[0, :, :, 0]
        np.testing.assert_array_equal(w[0], [0, 3, 6, 9])
        np.testing.assert_array_equal(w[1], [1, 4, 7, 10])
        np.testing.assert_array_equal(w[3], [12, 15, 18, 21])

    def test_masked_window_mean(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((1, 8, 2)).astype(np.float32)
        valid = np.array([[1, 1, 1, 0, 0, 0, 0, 0]], dtype=bool)
        got = np.asarray(ow.masked_window_mean(jnp.asarray(x),
                                               jnp.asarray(valid), 4))
        np.testing.assert_allclose(got[0, 0], x[0, :3].mean(0), rtol=1e-5)
        np.testing.assert_allclose(got[0, 1], 0.0)

    def test_window_stats_vs_numpy(self):
        rng = np.random.default_rng(7)
        depth, K = 5, 8
        xyz = rng.integers(0, 2**depth, size=(1, 16, 3)).astype(np.int32)
        valid = np.ones((1, 16), dtype=bool)
        valid[0, 13:] = False
        got = np.asarray(ow.window_stats(jnp.asarray(xyz), jnp.asarray(valid),
                                         depth, K, mode="cov"))
        pts = xyz * 2.0 ** (1 - depth) - 1.0
        for w in range(2):
            sel = pts[0, w * K:(w + 1) * K][valid[0, w * K:(w + 1) * K]]
            np.testing.assert_allclose(got[0, w, :3], sel.mean(0), rtol=1e-4,
                                       atol=1e-5)
            c = np.cov(sel.T)  # unbiased, matches torch .cov()
            expect = [c[0, 0], c[0, 1], c[0, 2], c[1, 1], c[1, 2], c[2, 2]]
            np.testing.assert_allclose(got[0, w, 3:], expect, rtol=1e-3,
                                       atol=1e-5)

    def test_rel_pos(self):
        xyz = jnp.arange(8 * 3, dtype=jnp.int32).reshape(1, 8, 3)
        rel = np.asarray(ow.window_rel_pos(xyz, 4))
        assert rel.shape == (1, 2, 4, 4, 3)
        np.testing.assert_array_equal(rel[0, 0, 1, 0],
                                      np.asarray(xyz)[0, 1] - np.asarray(xyz)[0, 0])


class TestDenseDwconv:
    """octree_dwconv_dense == octree_dwconv (the dense voxel-grid
    formulation must be numerically exact, fwd and grads)."""

    def _setup(self, depth=4, B=2, P=500, C=8):
        rng, octree = _fixture(seed=7, B=B, P=P, depth=depth)
        d = depth
        N = octree.cap(d)
        x = rng.normal(0, 1, (B, N, C)).astype(np.float32)
        # zero features at padding nodes (as the model guarantees)
        valid = np.asarray(octree.node_valid(d))
        x = np.where(valid[..., None], x, 0.0)
        w = rng.normal(0, 0.3, (27, C)).astype(np.float32)
        neigh = neigh_table(octree, d, "333")
        return octree, d, jnp.asarray(x), jnp.asarray(w), neigh

    def test_forward_matches_gather(self):
        octree, d, x, w, neigh = self._setup()
        ref = np.asarray(oc.octree_dwconv(x, neigh, w))
        got = np.asarray(oc.octree_dwconv_dense(
            x, octree.key(d), octree.count(d), octree.xyz(d),
            octree.node_valid(d), w, d))
        valid = np.asarray(octree.node_valid(d))
        np.testing.assert_allclose(got[valid], ref[valid],
                                   rtol=1e-5, atol=1e-5)
        # padding rows are zero by construction
        assert np.abs(got[~valid]).max() == 0.0

    def test_grads_match_gather(self):
        octree, d, x, w, neigh = self._setup(depth=3, P=300)
        valid = octree.node_valid(d)

        def f_dense(x, w):
            y = oc.octree_dwconv_dense(x, octree.key(d), octree.count(d),
                                       octree.xyz(d), valid, w, d)
            return jnp.sum(jnp.sin(y) * valid[..., None])

        def f_gather(x, w):
            y = oc.octree_dwconv(x, neigh, w)
            return jnp.sum(jnp.sin(y) * valid[..., None])

        gd = jax.grad(f_dense, argnums=(0, 1))(x, w)
        gg = jax.grad(f_gather, argnums=(0, 1))(x, w)
        # dx at padding rows: dense path zeroes them; gather path may
        # route cotangents through padding taps — compare valid rows.
        vmask = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(gd[0])[vmask],
                                   np.asarray(gg[0])[vmask],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gg[1]),
                                   rtol=1e-4, atol=1e-4)
