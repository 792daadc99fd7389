"""End-to-end trainer tests on a synthetic on-disk dataset: config
parsing, debug epoch loop, checkpoint save/restore."""
import os
import pickle

import jax
import numpy as np
import pytest

# Heavy-compile file: excluded from the fast core (pytest -m "not slow") — end-to-end trainer compiles.
pytestmark = pytest.mark.slow


from hotformerloc_tpu.config.params import parse_train_config
from hotformerloc_tpu.data.tuples import TrainingTuple


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("oxford_mini")
    rng = np.random.default_rng(0)
    queries = {}
    n_loc, k = 6, 2
    for loc in range(n_loc):
        base = rng.uniform(-0.9, 0.9, (256, 3))
        for pass_i in range(k):
            i = loc * k + pass_i
            pc = base + rng.normal(0, 0.01, base.shape)
            rel = f"scan_{i:03d}.bin"
            pc.astype(np.float64).tofile(root / rel)
            sibling = loc * k + (1 - pass_i)
            queries[i] = TrainingTuple(
                id=i, timestamp=i, rel_scan_filepath=rel,
                positives=np.array([sibling]),
                non_negatives=np.array(sorted([i, sibling])),
                position=np.array([float(loc), 0.0]))
    with open(root / "train.pickle", "wb") as f:
        pickle.dump(queries, f)

    cfg_dir = tmp_path_factory.mktemp("cfg")
    train_cfg = cfg_dir / "train.txt"
    train_cfg.write_text(f"""[DEFAULT]
dataset_folder = {root}

[TRAIN]
batch_size = 8
batch_split_size = 4
val_batch_size = 8
lr = 1e-3
epochs = 2
warmup_epochs = 1
scheduler_milestones = 2
aug_mode = 1
set_aug_mode = 1
octree_depth = 5
weight_decay = 1e-4
loss = TruncatedSmoothAP
tau1 = 0.01
positives_per_query = 1
similarity = cosine
dataset_name = Oxford
train_file = train.pickle
validation = False
eval_freq = 0
save_freq = 0
""")
    model_cfg = cfg_dir / "model.txt"
    model_cfg.write_text("""[MODEL]
model = HOTFormerLoc-Test
channels = 16,32
num_blocks = 1,1
num_heads = 2,2
num_pyramid_levels = 2
num_octf_levels = 1
ct_size = 1
ADaPE_mode = cov
patch_size = 8
dilation = 2
input_features = P
downsample_input_embeddings = True
num_input_downsamples = 1
grad_checkpoint = False
conv_norm = layernorm
feature_size = 32
output_dim = 32
pooling = PyramidAttnPoolMixer
k_pooled_tokens = 12,4
coordinates = cartesian
normalize_embeddings = True
""")
    return str(train_cfg), str(model_cfg)


class TestConfigParsing:
    def test_parse(self, synth_env):
        train_cfg, model_cfg = synth_env
        p = parse_train_config(train_cfg, model_cfg, num_points=256)
        assert p.batch_size == 8
        assert p.loss == "truncatedsmoothap"
        c = p.model_params.config
        assert c.channels == (16, 32)
        assert c.patch_size == 8
        assert c.octree_depth == 5
        assert c.pooling == "PyramidAttnPoolMixer"
        assert c.adape_mode == "cov"
        assert c.k_pooled_tokens == (12, 4)

    def test_parse_shipped_configs(self):
        for name in ("oxford", "wild-places", "cs-wild-places",
                     "cs-campus3d"):
            p = parse_train_config(f"configs/{name}.txt",
                                   f"configs/{name}_model.txt")
            c = p.model_params.config
            assert c.channels == (128, 256)
            assert c.num_blocks == (4, 10)
            assert sum(c.k_pooled_tokens) in (128, 256)


class TestTrainerLoop:
    def test_debug_train_and_resume(self, synth_env, tmp_path):
        import jax.numpy as jnp
        from hotformerloc_tpu.training.trainer import (Trainer,
                                                       load_checkpoint,
                                                       save_checkpoint)
        train_cfg, model_cfg = synth_env
        p = parse_train_config(train_cfg, model_cfg, debug=False,
                               num_points=256)
        p.epochs = 1
        trainer = Trainer(p, weights_dir=str(tmp_path / "w"),
                          model_name="t", dtype=jnp.float32)
        state = trainer.train(seed=0)
        assert state is not None
        assert int(state.step) >= 1
        # checkpoint roundtrip
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, state, epoch=1, best_metric=0.5)
        restored, epoch, best, extra = load_checkpoint(ck, state)
        assert epoch == 1 and best == 0.5
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # log file written
        logs = os.path.join(str(tmp_path / "w"), "Oxford",
                            "t_log.jsonl")
        assert os.path.exists(logs)


def test_checkpoint_extra_meta_roundtrip(tmp_path):
    """wandb run-id + sampler batch-size persistence (reference
    trainer.py:74-90,130-144)."""
    import jax.numpy as jnp
    import numpy as np
    from hotformerloc_tpu.training.step import TrainState
    from hotformerloc_tpu.training.trainer import (load_checkpoint,
                                                   save_checkpoint)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.ones((2,))},
                       model_state={}, opt_state=(),
                       ema_params=None)
    ck = str(tmp_path / "ck_meta")
    save_checkpoint(ck, state, epoch=3, best_metric=0.7,
                    extra_meta={"wandb_run_id": "run123",
                                "sampler_batch_size": 48})
    _, epoch, best, extra = load_checkpoint(ck, state)
    assert epoch == 3 and abs(best - 0.7) < 1e-9
    assert extra["wandb_run_id"] == "run123"
    assert extra["sampler_batch_size"] == 48
