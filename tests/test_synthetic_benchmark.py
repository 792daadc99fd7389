"""Synthetic benchmark generator: on-disk protocol compatibility and
retrievability (an oracle geometric descriptor must reach ~100% AR@1,
proving the task is learnable and the eval plumbing is sound)."""
import os
import pickle

import numpy as np

from hotformerloc_tpu.config.params import parse_train_config
from hotformerloc_tpu.evaluation.evaluate import evaluate
from hotformerloc_tpu.tools.synthetic_benchmark import LOCATIONS, generate


def _oracle_embed(points, pmask):
    """Descriptor = L2-normalised 4x4x4 occupancy histogram — place
    layouts are distinct, variants nearly identical, so this separates
    places without any training."""
    pts = np.asarray(points)
    msk = np.asarray(pmask)
    B = pts.shape[0]
    out = np.zeros((B, 64), np.float32)
    for b in range(B):
        p = pts[b][msk[b]]
        cell = np.clip(((p + 1.0) * 2).astype(int), 0, 3)
        flat = cell[:, 0] * 16 + cell[:, 1] * 4 + cell[:, 2]
        h = np.bincount(flat, minlength=64).astype(np.float32)
        out[b] = h / max(np.linalg.norm(h), 1e-9)
    return out


def test_generate_structure_and_oracle_recall(tmp_path):
    out = str(tmp_path / "bench")
    info = generate(out, places_per_loc=2, num_points=256, seed=0)
    assert info["n_places"] == 8
    # train pickle loads through the standard tuple loader
    with open(os.path.join(out, "train_tuples.pickle"), "rb") as f:
        queries = pickle.load(f)
    assert len(queries) == info["train_tuples"] == 16
    t = queries[0]
    assert os.path.exists(os.path.join(out, t.rel_scan_filepath))
    assert list(t.positives) == [1] and 0 in t.non_negatives

    # eval pickles: every location, 2 runs, correct neighbour maps
    for loc in LOCATIONS:
        with open(os.path.join(
                out, f"{loc}_evaluation_database.pickle"), "rb") as f:
            dbs = pickle.load(f)
        with open(os.path.join(
                out, f"{loc}_evaluation_query.pickle"), "rb") as f:
            qs = pickle.load(f)
        assert len(dbs) == len(qs) == 2
        assert qs[0][0][1] == [0]           # same index in the other run

    # configs parse; full eval path with the oracle descriptor
    params = parse_train_config(os.path.join(out, "train.txt"),
                                os.path.join(out, "model.txt"),
                                num_points=256)
    assert params.dataset_name == "Oxford"
    stats = evaluate(_oracle_embed, params)
    ar1 = float(stats["average"]["ave_recall"][0])
    assert ar1 >= 90.0, f"oracle AR@1 only {ar1}"
    assert stats["average"]["ave_one_percent_recall"] >= 90.0
