"""Metric-learning losses: TruncatedSmoothAP, batch-hard triplet /
contrastive, MESA distillation.

JAX ports of the reference loss stack
(/root/reference/models/losses/truncated_smoothap.py:10-99,
loss.py:27-148, loss_utils.py:9-63). All are pure functions of
(embeddings, positives_mask, negatives_mask) returning (loss, stats) —
stats as a dict of scalars so they aggregate under jit/pmean.

Distributed note (SURVEY.md §2.10): these losses consume the full
(B, B) pairwise affinity, so under pjit the embeddings are all-gathered
across the data mesh axis automatically — the TPU equivalent of the
reference's multistaged large-batch emulation
(/root/reference/training/trainer.py:287-365).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Stats = Dict[str, jnp.ndarray]


def tempered_sigmoid(x: jnp.ndarray, temp: float) -> jnp.ndarray:
    """sigmoid(x / temp) with the reference's +-50 exponent clamp
    (loss_utils.py:39-47)."""
    e = jnp.clip(-x / temp, -50.0, 50.0)
    return 1.0 / (1.0 + jnp.exp(e))


def compute_aff(e: jnp.ndarray, similarity: str = "cosine") -> jnp.ndarray:
    """(B, D) -> (B, B) affinity (loss_utils.py:51-63)."""
    if similarity == "cosine":
        return e @ e.T
    elif similarity == "euclidean":
        d2 = jnp.sum(e**2, 1)[:, None] + jnp.sum(e**2, 1)[None] - 2 * e @ e.T
        return -jnp.sqrt(jnp.maximum(d2, 1e-12))
    raise ValueError(similarity)


def truncated_smoothap(embeddings: jnp.ndarray, positives_mask: jnp.ndarray,
                       negatives_mask: jnp.ndarray, tau1: float = 0.01,
                       similarity: str = "cosine",
                       positives_per_query: int = 4
                       ) -> Tuple[jnp.ndarray, Stats]:
    """Smooth-AP surrogate over the positives_per_query closest positives.

    Differential-tested against a numpy port of
    models/losses/truncated_smoothap.py:33-99.
    """
    e = embeddings.astype(jnp.float32)
    B = e.shape[0]
    s_qz = compute_aff(e, similarity)

    s_pos = jnp.where(positives_mask, jax.lax.stop_gradient(s_qz), -jnp.inf)
    _, top_idx = jax.lax.top_k(s_pos, positives_per_query)     # (B, P)

    s_top = jnp.take_along_axis(s_qz, top_idx, axis=1)          # (B, P)
    s_diff = s_qz[:, None, :] - s_top[:, :, None]               # (B, P, B)
    sig = tempered_sigmoid(s_diff, tau1)

    pos_sig = sig * positives_mask[:, None, :]
    # zero the slot where z is the selected positive itself (sig==0.5)
    self_mask = 1.0 - jax.nn.one_hot(top_idx, B, dtype=sig.dtype)
    pos_sig = pos_sig * self_mask
    r_p = jnp.sum(pos_sig, axis=2) + 1.0                        # (B, P)
    r_omega = r_p + jnp.sum(sig * negatives_mask[:, None, :], axis=2)
    r = r_p / r_omega

    valid_pos = jnp.take_along_axis(positives_mask, top_idx, axis=1)
    masked_r = r * valid_pos
    n_valid = jnp.sum(valid_pos, axis=1)
    valid_q = n_valid > 0
    ap_q = jnp.sum(masked_r, axis=1) / jnp.maximum(n_valid, 1)
    nq = jnp.maximum(jnp.sum(valid_q), 1)
    ap = jnp.sum(jnp.where(valid_q, ap_q, 0.0)) / nq
    loss = 1.0 - ap

    # stats (truncated_smoothap.py:68-81)
    hard = jnp.sum((s_diff[:, 0, :] > 0) & negatives_mask, axis=1)
    stats = {
        "loss": loss,
        "ap": ap,
        "positives_per_query": jnp.mean(jnp.sum(positives_mask, axis=1)
                                        .astype(jnp.float32)),
        "best_positive_ranking": jnp.mean(hard.astype(jnp.float32)),
        "recall_at_1": jnp.mean((hard <= 1).astype(jnp.float32)),
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(e, axis=1)),
    }
    return loss, stats


def _pairwise_l2(e: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum(e**2, 1)[:, None] + jnp.sum(e**2, 1)[None] - 2 * e @ e.T
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def _mine_batch_hard(dist: jnp.ndarray, positives_mask, negatives_mask):
    """Hardest positive / hardest negative per anchor
    (loss.py:27-75). Returns (d_ap, ap_idx, d_an, an_idx, row_valid)."""
    pmask = positives_mask
    nmask = negatives_mask
    d_ap = jnp.max(jnp.where(pmask, dist, 0.0), axis=1)
    ap_idx = jnp.argmax(jnp.where(pmask, dist, -jnp.inf), axis=1)
    d_an = jnp.min(jnp.where(nmask, dist, jnp.inf), axis=1)
    an_idx = jnp.argmin(jnp.where(nmask, dist, jnp.inf), axis=1)
    valid = jnp.any(pmask, axis=1) & jnp.any(nmask, axis=1)
    return d_ap, ap_idx, jnp.where(jnp.isfinite(d_an), d_an, 0.0), an_idx, \
        valid


def _avg_nonzero(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """pytorch-metric-learning AvgNonZeroReducer: mean over strictly
    positive elements (of valid rows)."""
    nz = (x > 0) & valid
    return jnp.sum(jnp.where(nz, x, 0.0)) / jnp.maximum(jnp.sum(nz), 1)


def batch_hard_triplet_margin(embeddings, positives_mask, negatives_mask,
                              margin: float = 0.2
                              ) -> Tuple[jnp.ndarray, Stats]:
    """BatchHardTripletLossWithMasks (loss.py:78-103): triplet margin with
    swap=True (uses min(d(a,n), d(p,n))) and avg-nonzero reduction."""
    e = embeddings.astype(jnp.float32)
    dist = _pairwise_l2(e)
    d_ap, ap_idx, d_an, an_idx, valid = _mine_batch_hard(
        dist, positives_mask, negatives_mask)
    d_pn = dist[ap_idx, an_idx]
    d_neg = jnp.minimum(d_an, d_pn)          # swap
    losses = jnp.maximum(d_ap - d_neg + margin, 0.0)
    loss = _avg_nonzero(losses, valid)
    nvalid = jnp.maximum(jnp.sum(valid), 1)

    def vmean(x):
        return jnp.sum(jnp.where(valid, x, 0.0)) / nvalid

    stats = {
        "loss": loss,
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(e, axis=1)),
        "num_triplets": jnp.sum(valid).astype(jnp.float32),
        "num_non_zero_triplets": jnp.sum((losses > 0) & valid)
        .astype(jnp.float32),
        "mean_pos_pair_dist": vmean(d_ap),
        "mean_neg_pair_dist": vmean(d_an),
        "max_pos_pair_dist": jnp.max(jnp.where(valid, d_ap, -jnp.inf)),
        "min_pos_pair_dist": jnp.min(jnp.where(valid, d_ap, jnp.inf)),
        "max_neg_pair_dist": jnp.max(jnp.where(valid, d_an, -jnp.inf)),
        "min_neg_pair_dist": jnp.min(jnp.where(valid, d_an, jnp.inf)),
    }
    return loss, stats


def batch_hard_contrastive(embeddings, positives_mask, negatives_mask,
                           pos_margin: float = 0.2, neg_margin: float = 0.65
                           ) -> Tuple[jnp.ndarray, Stats]:
    """BatchHardContrastiveLossWithMasks (loss.py:106-135)."""
    e = embeddings.astype(jnp.float32)
    dist = _pairwise_l2(e)
    d_ap, _, d_an, _, valid = _mine_batch_hard(dist, positives_mask,
                                               negatives_mask)
    pos_loss = _avg_nonzero(jnp.maximum(d_ap - pos_margin, 0.0), valid)
    neg_loss = _avg_nonzero(jnp.maximum(neg_margin - d_an, 0.0), valid)
    loss = pos_loss + neg_loss
    stats = {
        "loss": loss,
        "pos_loss": pos_loss,
        "neg_loss": neg_loss,
        "num_pairs": 2.0 * jnp.sum(valid).astype(jnp.float32),
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(e, axis=1)),
    }
    return loss, stats


def kd_loss(student: jnp.ndarray, teacher: jnp.ndarray,
            temperature: float = 3.0, scale: float = 50.0) -> jnp.ndarray:
    """MESA distillation term: 50 * T-softened KL (loss.py:138-148),
    batchmean reduction."""
    p_log = jax.nn.log_softmax(student / temperature, axis=1)
    q = jax.nn.softmax(teacher / temperature, axis=1)
    kl = jnp.sum(q * (jnp.log(jnp.maximum(q, 1e-12)) - p_log), axis=1)
    return scale * jnp.mean(kl)


def make_loss(name: str, **kw):
    """Loss factory mirroring make_losses (loss.py:10-24)."""
    name = name.lower()
    if name == "truncatedsmoothap":
        return partial(truncated_smoothap,
                       tau1=kw.get("tau1", 0.01),
                       similarity=kw.get("similarity", "cosine"),
                       positives_per_query=kw.get("positives_per_query", 4))
    if name == "batchhardtripletmarginloss":
        return partial(batch_hard_triplet_margin,
                       margin=kw.get("margin", 0.2))
    if name == "batchhardcontrastiveloss":
        return partial(batch_hard_contrastive,
                       pos_margin=kw.get("pos_margin", 0.2),
                       neg_margin=kw.get("neg_margin", 0.65))
    raise NotImplementedError(f"Unknown loss: {name}")
