"""Tests for the auxiliary subsystems: profiling/introspection, elastic
preemption handling, hyperparameter overrides, and the analysis tools
(timestamp repair, ground-aerial overlap, window/positive visualisers)."""
import csv
import os
import pickle
import signal
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.config.params import update_params_from_dict


class TestProfiling:
    def test_time_fn(self):
        from hotformerloc_tpu.utils.profiling import time_fn
        f = jax.jit(lambda x: x * 2 + 1)
        stats = time_fn(f, jnp.ones((32, 32)), iters=3, warmup=1)
        assert stats["mean_s"] > 0 and stats["iters"] == 3

    def test_print_info_groups(self, capsys):
        from hotformerloc_tpu.utils.profiling import print_info
        params = {"backbone": {"w": jnp.ones((8, 8)), "b": jnp.ones(8)},
                  "pool": {"w": jnp.ones((4,))}}
        info = print_info("m", params, depth=1)
        assert info["total_params"] == 8 * 8 + 8 + 4
        assert info["groups"]["backbone"] == 72
        assert info["groups"]["pool"] == 4
        assert "Total parameters" in capsys.readouterr().out

    def test_step_cost(self):
        from hotformerloc_tpu.utils.profiling import step_cost
        cost = step_cost(lambda a, b: a @ b,
                         jnp.ones((64, 64)), jnp.ones((64, 64)))
        # CPU backend may not report flops; just require no crash and
        # plausible values when present.
        if "flops" in cost:
            assert cost["flops"] >= 2 * 64 * 64 * 64 * 0.9


class TestHyperparamOverrides:
    def _params(self):
        from hotformerloc_tpu.config.params import parse_train_config
        return parse_train_config("configs/oxford.txt",
                                  "configs/oxford_model.txt")

    def test_train_param_override(self):
        p = update_params_from_dict(self._params(), {"lr": 1e-5,
                                                     "epochs": 3})
        assert p.lr == 1e-5 and p.epochs == 3

    def test_model_config_override(self):
        p = self._params()
        old = p.model_params.config
        p = update_params_from_dict(p, {"patch_size": 16})
        assert p.model_params.config.patch_size == 16
        assert p.model_params.config.channels == old.channels

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            update_params_from_dict(self._params(), {"bogus_key": 1})


class TestElastic:
    def test_requeue_exit_saves_checkpoint(self, tmp_path):
        from hotformerloc_tpu.training.elastic import (REQUEUE_EXIT_CODE,
                                                       maybe_requeue_exit)

        class FakeTrainer:
            preempted = True
            best_metric = 0.25
            state = {"w": jnp.ones(3)}

            def ckpt_path(self, tag):
                return str(tmp_path / f"ck_{tag}.ckpt")

        t = FakeTrainer()
        with pytest.raises(SystemExit) as ex:
            maybe_requeue_exit(t, epoch=2)
        assert ex.value.code == REQUEUE_EXIT_CODE
        assert os.path.exists(t.ckpt_path("latest"))

    def test_not_preempted_is_noop(self):
        from hotformerloc_tpu.training.elastic import maybe_requeue_exit

        class FakeTrainer:
            preempted = False

        maybe_requeue_exit(FakeTrainer(), epoch=1)  # no exit

    def test_install_handler_sets_flag(self):
        from hotformerloc_tpu.training.elastic import \
            install_preemption_handler

        class FakeTrainer:
            preempted = False

        t = install_preemption_handler(FakeTrainer(),
                                       signals=[signal.SIGUSR2])
        os.kill(os.getpid(), signal.SIGUSR2)
        assert t.preempted
        signal.signal(signal.SIGUSR2, signal.SIG_DFL)

    def test_run_elastic_requeues(self, tmp_path):
        from hotformerloc_tpu.training.elastic import run_elastic
        marker = tmp_path / "ran_once"
        # first run exits 99 (preempted), second exits 0
        code = ("import os,sys;p=%r\n"
                "sys.exit(0 if os.path.exists(p) "
                "else (open(p,'w').close() or 99))" % str(marker))
        rc = run_elastic([sys.executable, "-c", code], max_requeues=2)
        assert rc == 0


class TestFixTimestamps:
    def test_fix_run(self, tmp_path):
        from hotformerloc_tpu.tools.fix_broken_timestamps import fix_run
        run = tmp_path / "run1"
        clouds = run / "Clouds_downsampled"
        clouds.mkdir(parents=True)
        stamps = ["1633.100", "1634.200", "1635.300"]
        for s in stamps:
            (clouds / f"{s}.pcd").touch()
        with open(run / "poses_aligned.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["timestamp", "x", "y", "z",
                                              "qx", "qy", "qz", "qw"])
            w.writeheader()
            # middle row has a broken (rounded) timestamp
            for s, broken in zip(stamps, ["1633.100", "1634.2", "1635.300"]):
                w.writerow({"timestamp": broken, "x": 1, "y": 2, "z": 3,
                            "qx": 0, "qy": 0, "qz": 0, "qw": 1})
        n = fix_run(str(run), "poses_aligned.csv",
                    "poses_aligned_fixed.csv", "Clouds_downsampled")
        assert n == 1
        with open(run / "poses_aligned_fixed.csv", newline="") as f:
            rows = list(csv.DictReader(f))
        assert [r["timestamp"] for r in rows] == stamps
        assert rows[1]["x"] == "1"


class TestGroundAerialOverlap:
    def test_pair_metrics_identical(self):
        from hotformerloc_tpu.tools.ground_aerial_overlap import pair_metrics
        pc = np.random.default_rng(0).normal(size=(200, 3))
        m = pair_metrics(pc, pc.copy(), overlap_radius=0.1)
        assert m["chamfer"] == pytest.approx(0.0, abs=1e-6)
        assert m["overlap_ratio"] == 1.0

    def test_pair_metrics_offset(self):
        from hotformerloc_tpu.tools.ground_aerial_overlap import pair_metrics
        a = np.zeros((10, 3))
        b = np.zeros((10, 3)) + [1.0, 0, 0]
        m = pair_metrics(a, b, overlap_radius=0.5)
        assert m["chamfer"] == pytest.approx(2.0, abs=1e-6)
        assert m["overlap_ratio"] == 0.0

    def test_process_split(self, tmp_path):
        from hotformerloc_tpu.data.loaders import write_pcd
        from hotformerloc_tpu.tools.ground_aerial_overlap import \
            process_split
        rng = np.random.default_rng(3)
        split = tmp_path / "Karawatha"
        base = [rng.uniform(-5, 5, (100, 3)) for _ in range(3)]
        for run, offset in [("ground_run1", 0.0), ("aerial_run", 0.05)]:
            d = split / run / "clouds"
            d.mkdir(parents=True)
            rows = []
            for i in range(3):
                pc = base[i] + offset
                write_pcd(str(d / f"{i}.pcd"), pc)
                rows.append({"timestamp": str(i), "x": i * 20.0, "y": 0.0,
                             "z": 0.0, "qx": 0, "qy": 0, "qz": 0, "qw": 1})
            with open(split / run / "poses.csv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0]))
                w.writeheader()
                w.writerows(rows)
        from hotformerloc_tpu.data.loaders import CSWildPlacesPointCloudLoader
        stats = process_split(str(split), "aerial",
                              CSWildPlacesPointCloudLoader(),
                              positive_max_thresh=10.0, overlap_radius=1.0)
        assert stats["pairs"] == 3
        assert stats["mean_overlap"] > 0.5


class TestVisualisers:
    def test_window_ids_roundtrip(self):
        """window_ids must agree with ops.window data_to_windows."""
        from hotformerloc_tpu.ops.window import data_to_windows
        from hotformerloc_tpu.tools.visualise_windows import window_ids
        K, D, N = 8, 2, 64
        ids = window_ids(N, K, D)
        slots = jnp.arange(N)[None, :, None]
        w = np.asarray(data_to_windows(slots, K, D))[0, :, :, 0]  # (W, K)
        expect = np.empty(N, dtype=np.int64)
        for wi in range(w.shape[0]):
            expect[w[wi]] = wi
        np.testing.assert_array_equal(ids, expect)

    def test_pick_positive(self):
        from hotformerloc_tpu.data.tuples import TrainingTuple
        from hotformerloc_tpu.tools.visualise_positives import pick_positive
        mk = lambda i, path, pos: TrainingTuple(
            id=i, timestamp=i, rel_scan_filepath=path,
            positives=np.array(pos), non_negatives=np.array(pos),
            position=np.array([float(i), 0.0]))
        tuples = {0: mk(0, "a/ground/0.pcd", [1, 2]),
                  1: mk(1, "a/ground/1.pcd", [0]),
                  2: mk(2, "a/aerial/2.pcd", [0])}
        # ground anchor, aerial positive required
        p = pick_positive(tuples, tuples[0], ground_aerial=True)
        assert p is tuples[2]
        # aerial anchor skipped in ground_aerial mode
        assert pick_positive(tuples, tuples[2], ground_aerial=True) is None
        # plain mode returns some positive
        assert pick_positive(tuples, tuples[1],
                             ground_aerial=False) is tuples[0]

    def test_octree_window_points(self):
        from hotformerloc_tpu.tools.visualise_windows import \
            octree_window_points
        pc = np.random.default_rng(0).uniform(-0.9, 0.9, (300, 3)) \
            .astype(np.float32)
        out = octree_window_points(pc, max_depth=4, min_depth=3,
                                   patch_size=8, dilation=1)
        assert set(out) == {3, 4}
        pts, wids = out[4]
        assert pts.shape[0] == wids.shape[0] > 0
        assert np.all(np.abs(pts) <= 1.0 + 1e-5)


class TestProfileStepTool:
    def test_write_report(self, tmp_path):
        from hotformerloc_tpu.tools.profile_step import write_report
        out = tmp_path / "PROFILE.md"
        summary = {"device": "cpu", "flops_per_step": 1e9, "mfu": 0.1}
        ops = [{"op": "fusion", "time_us": 10.0, "pct": 50.0},
               {"op": "convolution", "time_us": 10.0, "pct": 50.0}]
        write_report(str(out), summary, ops)
        text = out.read_text()
        assert "fusion" in text and "mfu" in text

    def test_write_report_no_ops(self, tmp_path):
        from hotformerloc_tpu.tools.profile_step import write_report
        out = tmp_path / "PROFILE.md"
        write_report(str(out), {"device": "cpu"}, [])
        assert "no xplane data" in out.read_text()

    def test_top_ops_missing_dir(self, tmp_path):
        from hotformerloc_tpu.tools.profile_step import _top_ops_from_xplane
        assert _top_ops_from_xplane(str(tmp_path / "nope")) == ([], [])
