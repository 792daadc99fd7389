"""Loss tests: differential vs independent numpy ports of the reference
semantics (models/losses/truncated_smoothap.py, loss.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hotformerloc_tpu.losses.losses import (batch_hard_contrastive,
                                            batch_hard_triplet_margin,
                                            compute_aff, kd_loss, make_loss,
                                            truncated_smoothap)


def make_batch(rng, B=16, D=8, k=2, normalize=True):
    """k=2-positive-pair batch structure like the reference sampler."""
    e = rng.standard_normal((B, D)).astype(np.float32)
    if normalize:
        e /= np.linalg.norm(e, axis=1, keepdims=True)
    groups = np.repeat(np.arange(B // k), k)
    pos = (groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)
    neg = groups[:, None] != groups[None]
    return e, pos, neg


def np_smoothap(e, pos, neg, tau1=0.01, ppq=4):
    """Golden numpy TruncatedSmoothAP (truncated_smoothap.py:33-99)."""
    s = e @ e.T
    sp = np.where(pos, s, -np.inf)
    top = np.argsort(-sp, axis=1, kind="stable")[:, :ppq]
    s_top = np.take_along_axis(s, top, 1)
    s_diff = s[:, None, :] - s_top[:, :, None]
    sig = 1.0 / (1.0 + np.exp(np.clip(-s_diff / tau1, -50, 50)))
    pos_sig = sig * pos[:, None, :]
    for i in range(e.shape[0]):
        for j in range(ppq):
            pos_sig[i, j, top[i, j]] = 0.0
    r_p = pos_sig.sum(2) + 1.0
    r_omega = r_p + (sig * neg[:, None, :]).sum(2)
    r = r_p / r_omega
    vp = np.take_along_axis(pos, top, 1)
    masked_r = r * vp
    nv = vp.sum(1)
    vq = nv > 0
    ap = (masked_r.sum(1)[vq] / nv[vq]).mean()
    return 1.0 - ap


class TestSmoothAP:
    def test_matches_numpy_golden(self):
        rng = np.random.default_rng(0)
        e, pos, neg = make_batch(rng, B=32)
        loss, stats = truncated_smoothap(jnp.asarray(e), jnp.asarray(pos),
                                         jnp.asarray(neg))
        np.testing.assert_allclose(float(loss), np_smoothap(e, pos, neg),
                                   rtol=1e-5)
        assert 0.0 <= float(stats["recall_at_1"]) <= 1.0
        np.testing.assert_allclose(float(stats["positives_per_query"]), 1.0)

    def test_perfect_embeddings_low_loss(self):
        # positives identical, negatives orthogonal -> AP ~ 1
        rng = np.random.default_rng(1)
        B, k = 16, 2
        base = rng.standard_normal((B // k, 64)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        e = np.repeat(base, k, axis=0)
        groups = np.repeat(np.arange(B // k), k)
        pos = (groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)
        neg = groups[:, None] != groups[None]
        loss, stats = truncated_smoothap(jnp.asarray(e), jnp.asarray(pos),
                                         jnp.asarray(neg))
        assert float(loss) < 0.1
        assert float(stats["recall_at_1"]) == 1.0

    def test_gradient_flows(self):
        import jax
        rng = np.random.default_rng(2)
        e, pos, neg = make_batch(rng)

        def f(e):
            return truncated_smoothap(e, jnp.asarray(pos),
                                      jnp.asarray(neg))[0]

        g = jax.grad(f)(jnp.asarray(e))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

    def test_euclidean_similarity(self):
        rng = np.random.default_rng(3)
        e, pos, neg = make_batch(rng)
        loss, _ = truncated_smoothap(jnp.asarray(e), jnp.asarray(pos),
                                     jnp.asarray(neg),
                                     similarity="euclidean")
        assert np.isfinite(float(loss))


class TestBatchHard:
    def np_triplet(self, e, pos, neg, margin=0.2):
        d = np.sqrt(np.maximum(
            (e**2).sum(1)[:, None] + (e**2).sum(1)[None] - 2 * e @ e.T,
            1e-12))
        losses = []
        for a in range(len(e)):
            if not pos[a].any() or not neg[a].any():
                continue
            p = np.argmax(np.where(pos[a], d[a], -np.inf))
            n = np.argmin(np.where(neg[a], d[a], np.inf))
            d_an = min(d[a, n], d[p, n])  # swap=True
            l = max(d[a, p] - d_an + margin, 0.0)
            losses.append(l)
        nz = [l for l in losses if l > 0]
        return np.mean(nz) if nz else 0.0

    def test_triplet_matches_numpy(self):
        rng = np.random.default_rng(4)
        e, pos, neg = make_batch(rng, B=12, normalize=False)
        loss, stats = batch_hard_triplet_margin(jnp.asarray(e),
                                                jnp.asarray(pos),
                                                jnp.asarray(neg),
                                                margin=0.2)
        np.testing.assert_allclose(float(loss),
                                   self.np_triplet(e, pos, neg), rtol=1e-4)
        assert float(stats["num_triplets"]) == 12

    def test_contrastive_finite(self):
        rng = np.random.default_rng(5)
        e, pos, neg = make_batch(rng, B=12, normalize=False)
        loss, stats = batch_hard_contrastive(jnp.asarray(e),
                                             jnp.asarray(pos),
                                             jnp.asarray(neg))
        assert np.isfinite(float(loss))
        assert float(stats["num_pairs"]) == 24


class TestMisc:
    def test_kd_loss_zero_when_equal(self):
        rng = np.random.default_rng(6)
        y = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        assert float(kd_loss(y, y)) < 1e-5
        t = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        assert float(kd_loss(y, t)) > 0

    def test_factory(self):
        for name in ("truncatedsmoothap", "batchhardtripletmarginloss",
                     "batchhardcontrastiveloss"):
            fn = make_loss(name)
            rng = np.random.default_rng(7)
            e, pos, neg = make_batch(rng)
            loss, stats = fn(jnp.asarray(e), jnp.asarray(pos),
                             jnp.asarray(neg))
            assert np.isfinite(float(loss))
        with pytest.raises(NotImplementedError):
            make_loss("nope")

    def test_affinity(self):
        rng = np.random.default_rng(8)
        e = rng.standard_normal((6, 4)).astype(np.float32)
        a = np.asarray(compute_aff(jnp.asarray(e), "cosine"))
        np.testing.assert_allclose(a, e @ e.T, rtol=1e-5)
        d = np.asarray(compute_aff(jnp.asarray(e), "euclidean"))
        from scipy.spatial.distance import cdist
        np.testing.assert_allclose(-d, cdist(e, e), rtol=1e-4, atol=2e-3)
