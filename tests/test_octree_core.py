"""Octree engine tests: Morton keys, batched build, neighbour tables.

Follows the reference's differential-test strategy
(/root/reference/libs/dwconv/test/test_octree_dwconv.py): every device op
is checked against an independent pure-numpy golden implementation on
deterministic random point clouds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.octree import morton
from hotformerloc_tpu.octree.build import (BatchedOctree, build_batched_octree,
                                           default_capacities)
from hotformerloc_tpu.octree.neigh import (child_table, kernel_offsets,
                                           neigh_table)


def np_morton(xyz):
    """Golden scalar Morton encode."""
    out = np.zeros(xyz.shape[:-1], dtype=np.int64)
    for i in range(10):
        out |= ((xyz[..., 0] >> i) & 1) << (3 * i + 2)
        out |= ((xyz[..., 1] >> i) & 1) << (3 * i + 1)
        out |= ((xyz[..., 2] >> i) & 1) << (3 * i)
    return out


def rand_points(rng, n, scale=1.0):
    return (rng.uniform(-scale, scale, size=(n, 3))).astype(np.float32)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        xyz = rng.integers(0, 1024, size=(1000, 3)).astype(np.int32)
        key = morton.encode(jnp.asarray(xyz))
        np.testing.assert_array_equal(np.asarray(key), np_morton(xyz))
        dec = morton.decode(key)
        np.testing.assert_array_equal(np.asarray(dec), xyz)

    def test_order_matches_sorted_tuples(self):
        # Morton order must equal lexicographic order of interleaved bits:
        # sorting keys gives a z-order traversal.
        rng = np.random.default_rng(1)
        xyz = rng.integers(0, 64, size=(500, 3)).astype(np.int32)
        keys = np.asarray(morton.encode(jnp.asarray(xyz)))
        order = np.argsort(keys, kind="stable")
        # parents of sorted children are themselves sorted
        pkeys = keys[order] >> 3
        assert np.all(np.diff(pkeys) >= 0)

    def test_grid_quantization(self):
        pts = jnp.array([[-1.0, -1.0, -1.0], [0.9999, 0.9999, 0.9999],
                         [0.0, 0.0, 0.0]])
        g = morton.points_to_grid(pts, 4)
        np.testing.assert_array_equal(np.asarray(g),
                                      [[0, 0, 0], [15, 15, 15], [8, 8, 8]])
        # inverse rescale: voxel coord u maps to u*2^(1-d) - 1
        p = morton.grid_to_points(g, 4)
        np.testing.assert_allclose(np.asarray(p)[0], [-1, -1, -1])


def golden_octree(points, depth, min_depth):
    """Golden hierarchy: per depth, sorted unique keys of non-empty octants."""
    grid = np.clip(np.floor((points + 1.0) * 2 ** (depth - 1)), 0,
                   2**depth - 1).astype(np.int32)
    leaf_keys = np.unique(np_morton(grid))
    out = {depth: leaf_keys}
    k = leaf_keys
    for d in range(depth - 1, min_depth - 1, -1):
        k = np.unique(k >> 3)
        out[d] = k
    return out


class TestBuild:
    @pytest.mark.parametrize("depth,min_depth,P", [(6, 2, 512), (9, 4, 2048)])
    def test_matches_golden_hierarchy(self, depth, min_depth, P):
        rng = np.random.default_rng(42)
        pts = np.stack([rand_points(rng, P), rand_points(rng, P, 0.3)])
        mask = np.ones(pts.shape[:2], dtype=bool)
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask),
                                  depth, min_depth)
        for b in range(2):
            gold = golden_octree(pts[b], depth, min_depth)
            for d in range(min_depth, depth + 1):
                cnt = int(oc.count(d)[b])
                assert cnt == len(gold[d]), f"depth {d}"
                got = np.asarray(oc.key(d)[b][:cnt])
                np.testing.assert_array_equal(got, gold[d])
                # padding tail is SENTINEL
                assert np.all(np.asarray(oc.key(d)[b][cnt:]) >= 2**30)

    def test_parent_links(self):
        rng = np.random.default_rng(3)
        pts = rand_points(rng, 777)[None]
        mask = np.ones((1, 777), dtype=bool)
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask), 6, 2)
        for d in range(3, 7):
            cnt = int(oc.count(d)[0])
            par = np.asarray(oc.parent(d)[0])
            keys_d = np.asarray(oc.key(d)[0])
            keys_p = np.asarray(oc.key(d - 1)[0])
            for i in range(cnt):
                assert par[i] >= 0
                assert keys_p[par[i]] == keys_d[i] >> 3
            assert np.all(par[cnt:] == -1)

    def test_leaf_mean_positions(self):
        rng = np.random.default_rng(7)
        pts = rand_points(rng, 300)[None]
        mask = np.ones((1, 300), dtype=bool)
        depth = 5
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask), depth, 2)
        grid = np.clip(np.floor((pts[0] + 1.0) * 2 ** (depth - 1)), 0,
                       2**depth - 1).astype(np.int32)
        keys = np_morton(grid)
        cnt = int(oc.count(depth)[0])
        leaf_keys = np.asarray(oc.key(depth)[0][:cnt])
        means = np.asarray(oc.leaf_mean[0][:cnt])
        for i, k in enumerate(leaf_keys):
            sel = keys == k
            np.testing.assert_allclose(means[i], pts[0][sel].mean(0),
                                       rtol=1e-5, atol=1e-6)

    def test_point_mask_respected(self):
        rng = np.random.default_rng(11)
        pts = rand_points(rng, 400)[None]
        mask = np.zeros((1, 400), dtype=bool)
        mask[0, :100] = True
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask), 5, 2)
        gold = golden_octree(pts[0, :100], 5, 2)
        assert int(oc.count(5)[0]) == len(gold[5])

    def test_jit_and_vmap_stability(self):
        rng = np.random.default_rng(13)
        pts = jnp.asarray(np.stack([rand_points(rng, 256) for _ in range(4)]))
        mask = jnp.ones(pts.shape[:2], dtype=bool)
        f = jax.jit(lambda p, m: build_batched_octree(p, m, 5, 2))
        oc1 = f(pts, mask)
        oc2 = build_batched_octree(pts, mask, 5, 2)
        np.testing.assert_array_equal(np.asarray(oc1.key(5)),
                                      np.asarray(oc2.key(5)))


class TestNeigh:
    def _octree(self, seed=5, P=600, depth=5, B=2):
        rng = np.random.default_rng(seed)
        pts = np.stack([rand_points(rng, P) for _ in range(B)])
        mask = np.ones(pts.shape[:2], dtype=bool)
        return pts, build_batched_octree(jnp.asarray(pts), jnp.asarray(mask),
                                         depth, 2)

    def test_neigh_333_golden(self):
        pts, oc = self._octree()
        d = 5
        offs = kernel_offsets("333")
        tab = np.asarray(neigh_table(oc, d, "333"))
        for b in range(2):
            cnt = int(oc.count(d)[b])
            keys = np.asarray(oc.key(d)[b][:cnt])
            lut = {k: i for i, k in enumerate(keys)}
            xyz = np.asarray(morton.decode(jnp.asarray(keys)))
            for i in range(0, cnt, 17):
                for k, off in enumerate(offs):
                    n = xyz[i] + off
                    if np.all((n >= 0) & (n < 2**d)):
                        expect = lut.get(int(np_morton(n[None])[0]), -1)
                    else:
                        expect = -1
                    assert tab[b, i, k] == expect
            assert np.all(tab[b, cnt:] == -1)

    def test_all_neigh_tables_match_search(self):
        # The table-driven parent recurrence (all_neigh_tables, the ocnn
        # construct_all_neigh design) must equal the golden-tested
        # binary-search neigh_table at EVERY depth, including partially
        # masked clouds (padding rows all -1).
        rng = np.random.default_rng(9)
        pts = np.stack([rand_points(rng, 500) for _ in range(3)])
        mask = np.ones(pts.shape[:2], dtype=bool)
        mask[1, 350:] = False
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask), 6, 2)
        childrens = tuple(
            child_table(oc, d) if d > oc.min_depth else None
            for d in range(oc.min_depth, oc.depth + 1))
        from hotformerloc_tpu.octree.neigh import all_neigh_tables
        got = all_neigh_tables(oc, childrens)
        for d in range(oc.min_depth, oc.depth + 1):
            want = np.asarray(neigh_table(oc, d, "333"))
            np.testing.assert_array_equal(
                np.asarray(got[oc.level(d)]), want,
                err_msg=f"depth {d}")

    def test_all_neigh_tables_nonfull_base_level(self):
        # Regression (round-2 HEAD): when the coarsest level is NOT full
        # (count < cap, so padding rows exist), _dense_base_neigh's padding
        # rows used to scatter their ids into the inverse-map dump slot
        # that invalid queries read back, returning the last padding row
        # instead of -1 for every missing neighbour. A base level at
        # min_depth 4 with few points guarantees padding rows.
        rng = np.random.default_rng(21)
        pts = np.stack([rand_points(rng, 300) for _ in range(2)])
        mask = np.ones(pts.shape[:2], dtype=bool)
        mask[1, 200:] = False
        oc = build_batched_octree(jnp.asarray(pts), jnp.asarray(mask), 6, 4)
        assert int(oc.count(oc.min_depth)[0]) < oc.cap(oc.min_depth), \
            "fixture must exercise a non-full base level"
        childrens = tuple(
            child_table(oc, d) if d > oc.min_depth else None
            for d in range(oc.min_depth, oc.depth + 1))
        from hotformerloc_tpu.octree.neigh import all_neigh_tables
        got = all_neigh_tables(oc, childrens)
        for d in range(oc.min_depth, oc.depth + 1):
            want = np.asarray(neigh_table(oc, d, "333"))
            np.testing.assert_array_equal(
                np.asarray(got[oc.level(d)]), want,
                err_msg=f"depth {d}")

    def test_identity_tap(self):
        _, oc = self._octree()
        tab = np.asarray(neigh_table(oc, 4, "111"))
        cnt = int(oc.count(4)[0])
        np.testing.assert_array_equal(tab[0, :cnt, 0], np.arange(cnt))

    def test_child_table_inverts_parent(self):
        _, oc = self._octree()
        d = 5
        ct = np.asarray(child_table(oc, d))
        par = np.asarray(oc.parent(d))
        keys = np.asarray(oc.key(d))
        for b in range(2):
            cnt = int(oc.count(d)[b])
            for i in range(cnt):
                p, o = par[b, i], keys[b, i] & 7
                assert ct[b, p, o] == i
            # children slots either -1 or valid node of right octant
            pcnt = int(oc.count(d - 1)[b])
            for j in range(pcnt):
                for o in range(8):
                    c = ct[b, j, o]
                    if c >= 0:
                        assert keys[b, c] & 7 == o
                        assert par[b, c] == j
