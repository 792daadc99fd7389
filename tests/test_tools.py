"""Tests for the offline dataset tooling (tools/)."""
import os
import pickle

import numpy as np
import pytest

from hotformerloc_tpu.data.loaders import read_pcd, write_pcd
from hotformerloc_tpu.tools.geometry import Polygon, make_circle
from hotformerloc_tpu.tools.preprocess import (normalise_pcl,
                                               pnvlad_down_sample,
                                               remove_ground_csf,
                                               remove_outliers,
                                               voxel_down_sample)


class TestGeometry:
    def test_square_contains(self):
        sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
        assert sq.contains(5, 5)
        assert not sq.contains(15, 5)
        assert not sq.contains(-1, -1)

    def test_concave_polygon(self):
        # L-shape: the notch must be outside
        L = Polygon([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
        assert L.contains(1, 3)
        assert L.contains(3, 1)
        assert not L.contains(3, 3)

    def test_distance_and_buffer(self):
        sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
        assert sq.distance(5, 5) == 0.0
        assert sq.distance(13, 5) == pytest.approx(3.0)
        assert sq.buffer_contains(13, 5, 3.0)
        assert not sq.buffer_contains(13.5, 5, 3.0)

    def test_circle(self):
        c = make_circle(0, 0, 30)
        assert c.contains(29, 0) and not c.contains(31, 0)


class TestPreprocess:
    def test_voxel_down_sample_centroids(self):
        # two clusters of 4 points each in separate voxels
        a = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2],
                      [5.1, 5.1, 5.1], [5.2, 5.2, 5.2]])
        out = voxel_down_sample(a, 1.0)
        assert out.shape == (2, 3)
        assert np.allclose(sorted(out[:, 0]), [0.15, 5.15])

    def test_pnvlad_down_sample_exact_count(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, (20000, 3))
        out = pnvlad_down_sample(pts, 4096)
        assert out.shape == (4096, 3)

    def test_remove_outliers(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(0, 1.0, (500, 3))
        pts = np.vstack([pts, [[100.0, 100.0, 100.0]]])
        kept, _ = remove_outliers(pts)
        assert len(kept) < len(pts)
        assert not np.any(np.all(kept == [100, 100, 100], axis=1))

    def test_normalise_bounds_and_count(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-50, 50, (8000, 3))
        down = pts[:4096]
        out = normalise_pcl(down, pts, 4096)
        assert out.shape == (4096, 3)
        assert out.min() >= -1 and out.max() <= 1

    def test_csf_ground_removal(self):
        rng = np.random.default_rng(0)
        # flat ground plane at z=0 + a tree trunk at (5, 5)
        ground = np.column_stack([rng.uniform(0, 20, 4000),
                                  rng.uniform(0, 20, 4000),
                                  rng.normal(0, 0.03, 4000)])
        trunk = np.column_stack([rng.normal(5, 0.2, 800),
                                 rng.normal(5, 0.2, 800),
                                 rng.uniform(1.5, 8, 800)])
        pts = np.vstack([ground, trunk])
        out = remove_ground_csf(pts)
        # most ground removed, most trunk kept
        assert len(out) < 0.4 * len(pts)
        kept_high = np.count_nonzero(out[:, 2] > 1.0)
        assert kept_high > 0.9 * len(trunk)


class TestPcdRoundtrip:
    def test_write_read(self, tmp_path):
        pts = np.random.default_rng(0).uniform(-1, 1, (100, 3)) \
            .astype(np.float32)
        p = str(tmp_path / "a.pcd")
        write_pcd(p, pts)
        back = read_pcd(p)
        assert np.allclose(back, pts, atol=1e-6)


class TestTupleGeneration:
    def _fake_oxford(self, root):
        """Synthetic Oxford tree: 3 runs, CSVs + empty .bin files."""
        import csv
        rng = np.random.default_rng(0)
        base_n, base_e = 5735000.0, 620000.0
        for r in range(3):
            run = os.path.join(root, "oxford", f"run{r}")
            for sub, csvname in [("pointcloud_20m_10overlap",
                                  "pointcloud_locations_20m_10overlap.csv"),
                                 ("pointcloud_20m",
                                  "pointcloud_locations_20m.csv")]:
                os.makedirs(os.path.join(run, sub), exist_ok=True)
                with open(os.path.join(run, csvname), "w",
                          newline="") as f:
                    w = csv.writer(f)
                    w.writerow(["timestamp", "northing", "easting"])
                    for i in range(12):
                        ts = 1000 * (r + 1) + i
                        n = base_n + i * 15 + rng.normal(0, 1)
                        e = base_e + i * 15 + rng.normal(0, 1)
                        w.writerow([ts, n, e])
                        open(os.path.join(run, sub, f"{ts}.bin"),
                             "wb").close()

    def test_pnv_training_tuples(self, tmp_path):
        from hotformerloc_tpu.data.tuples import load_training_queries
        from hotformerloc_tpu.tools.pnv_tuples import \
            generate_training_tuples
        root = str(tmp_path)
        self._fake_oxford(root)
        generate_training_tuples(root)
        q = load_training_queries(
            os.path.join(root, "training_queries_baseline2.pickle"))
        assert len(q) > 0
        t0 = q[0]
        assert t0.rel_scan_filepath.endswith(".bin")
        # positives within 10 m: runs are offset by ~1 m noise at the
        # same index, so each query has >= 1 positive from other runs
        assert len(t0.positives) >= 1
        assert 0 not in t0.positives  # self excluded
        assert np.all(np.diff(t0.non_negatives) >= 0)  # sorted

    def test_pnv_test_sets_ground_truth(self, tmp_path):
        from hotformerloc_tpu.tools.pnv_tuples import \
            construct_query_and_database_sets, P_DICT
        root = str(tmp_path)
        self._fake_oxford(root)
        construct_query_and_database_sets(
            root, "oxford/", ["run0", "run1"], "/pointcloud_20m/",
            "pointcloud_locations_20m.csv", [[5735000.0, 620000.0]],
            "oxford")
        with open(os.path.join(root,
                               "oxford_evaluation_query.pickle"),
                  "rb") as f:
            qs = pickle.load(f)
        with open(os.path.join(root,
                               "oxford_evaluation_database.pickle"),
                  "rb") as f:
            dbs = pickle.load(f)
        assert len(qs) == 2 and len(dbs) == 2
        # cross-run ground truth recorded under the db-run index
        found = any(0 in qs[1][k] and len(qs[1][k][0]) > 0
                    for k in qs[1])
        assert found

    def test_cscampus3d_convert(self, tmp_path):
        from hotformerloc_tpu.tools.cscampus3d_convert import (
            convert_query_pickle, convert_train_pickle)
        train = {0: {"query": "umd/000.bin", "positives": [1],
                     "negatives": [2], "northing": 1.0, "easting": 2.0},
                 1: {"query": "umd/001.bin", "positives": [0],
                     "negatives": [], "northing": 1.5, "easting": 2.5},
                 2: {"query": "umd/002.bin", "positives": [],
                     "negatives": [0, 1], "northing": 9., "easting": 9.}}
        src = str(tmp_path / "train.pickle")
        with open(src, "wb") as f:
            pickle.dump(train, f)
        dst = str(tmp_path / "train_v2.pickle")
        convert_train_pickle(src, dst)
        from hotformerloc_tpu.data.tuples import load_training_queries
        q = load_training_queries(dst)
        assert list(q[0].positives) == [1]
        # non_negatives = all ids minus negatives
        assert list(q[0].non_negatives) == [0, 1]
        qsrc = str(tmp_path / "q.pickle")
        with open(qsrc, "wb") as f:
            pickle.dump([[("a", 1), ("b", 2)]], f)
        qdst = str(tmp_path / "q_v2.pickle")
        convert_query_pickle(qsrc, qdst)
        with open(qdst, "rb") as f:
            out = pickle.load(f)
        assert out[0][0] == ("a", 1)


class TestPostprocessPipeline:
    def test_end_to_end(self, tmp_path):
        from hotformerloc_tpu.tools.postprocess_submaps import \
            postprocess_points
        rng = np.random.default_rng(0)
        pts = rng.uniform(-30, 30, (30000, 3))
        out = postprocess_points(
            pts, remove_ground=False, downsample=True,
            downsample_type="pnvlad", downsample_target=4096,
            voxel_size=0.8, normalise=True, min_num_points=4096,
            radius_max=25.0)
        assert out is not None
        assert out.shape == (4096, 3)
        assert np.abs(out).max() <= 1.0

    def test_rejects_small_clouds(self):
        from hotformerloc_tpu.tools.postprocess_submaps import \
            postprocess_points
        pts = np.random.default_rng(0).uniform(-1, 1, (100, 3))
        out = postprocess_points(
            pts, remove_ground=False, downsample=True,
            downsample_type="random", downsample_target=4096,
            voxel_size=0.8, normalise=False, min_num_points=4096)
        assert out is None


class TestRadiusQueryNative:
    def test_utm_scale_matches_brute_force(self):
        """The fp32 native path must agree with float64 brute force on
        UTM-magnitude coordinates (centring guards the precision)."""
        from hotformerloc_tpu.tools.geometry import radius_query
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 200, (500, 2)) + [6.2e6, 4.5e5]
        out = radius_query(pts, pts[:50], radius=3.0)
        for q in range(50):
            d2 = ((pts - pts[q]) ** 2).sum(1)
            expect = np.sort(np.where(d2 <= 9.0)[0])
            np.testing.assert_array_equal(out[q], expect)
