"""Native pointops library tests: C++ vs numpy/JAX goldens."""
import numpy as np
import pytest

from hotformerloc_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    l = native.load_library()
    if l is None:
        pytest.skip("libpointops.so unavailable and build failed")
    return l


class TestNative:
    def test_morton_matches_jax(self, lib):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        got = native.morton_encode(pts, 7)
        import jax.numpy as jnp
        from hotformerloc_tpu.octree import morton as jm
        expect = np.asarray(jm.encode(jm.points_to_grid(jnp.asarray(pts),
                                                        7)))
        np.testing.assert_array_equal(got, expect)

    def test_voxel_downsample(self, lib):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
        out = native.voxel_downsample(pts, 1.0)
        assert 0 < len(out) <= 2000
        # golden: unique voxel count matches
        g = np.floor(pts / 1.0).astype(np.int64)
        nvox = len(np.unique(g, axis=0))
        assert len(out) == nvox
        # every output point lies inside its voxel's bounds +- eps
        gg = np.floor(out / 1.0 + 1e-5).astype(np.int64)
        assert len(np.unique(gg, axis=0)) >= nvox * 0.95

    def test_radius_search_matches_bruteforce(self, lib):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 100, (800, 2)).astype(np.float32)
        qs = rng.uniform(0, 100, (50, 2)).astype(np.float32)
        r = 5.0
        offs, idx = native.radius_search_2d(pts, qs, r)
        for q in range(len(qs)):
            got = set(idx[offs[q]:offs[q + 1]].tolist())
            d2 = np.sum((pts - qs[q]) ** 2, axis=1)
            expect = set(np.nonzero(d2 <= r * r)[0].tolist())
            assert got == expect, f"query {q}"
