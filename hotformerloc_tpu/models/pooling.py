"""Global descriptor heads: GeM family, SALSA attention-pool + mixer.

Re-implements /root/reference/models/layers/pooling.py,
pooling_wrapper.py, salsa.py and netvlad.py on masked static token
tensors. The shipped head in all four reference configs is
PyramidAttnPoolMixer (pooling.py:106-233).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.models.attention import AdaptivePooling
from hotformerloc_tpu.models.layers import Dtype, Mlp, dense


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) masked mean over N."""
    w = mask.astype(x.dtype)
    s = jnp.einsum("bnc,bn->bc", x, w)
    return s / jnp.maximum(jnp.sum(w, axis=1), 1.0)[:, None]


class GeM(nn.Module):
    """Generalised-mean pooling over valid octree nodes
    (OctGeM, models/layers/pooling.py:18-39). clamp(eps)^p -> masked
    mean -> ^(1/p), learnable p."""
    p_init: float = 3.0
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        p = self.param("p", nn.initializers.constant(self.p_init), (1,))
        p = p.astype(jnp.float32)
        xf = jnp.clip(x.astype(jnp.float32), self.eps, None) ** p
        return (masked_mean(xf, mask) ** (1.0 / p)).astype(self.dtype)


class GatingContext(nn.Module):
    """NetVLAD context gating (models/layers/netvlad.py:77-112)."""
    dim: int
    add_batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = dense(self.dim, self.dtype, use_bias=not self.add_batch_norm,
                  name="gating_weights")(x)
        if self.add_batch_norm:
            g = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="gating_bn")(g)
        return x * nn.sigmoid(g)


class NetVLADLoupe(nn.Module):
    """NetVLAD aggregation (models/layers/netvlad.py:18-75): soft-assign
    tokens to clusters, aggregate residual-style, normalise."""
    feature_size: int
    cluster_size: int
    output_dim: int
    gating: bool = True
    add_batch_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        B, N, C = x.shape
        K = self.cluster_size
        cw = self.param("cluster_weights",
                        nn.initializers.normal(1.0 / jnp.sqrt(C)), (C, K))
        a = jnp.einsum("bnc,ck->bnk", x, cw.astype(self.dtype))
        if self.add_batch_norm:
            a = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="assign_bn")(a)
        else:
            b = self.param("cluster_biases",
                           nn.initializers.normal(1.0 / jnp.sqrt(C)), (K,))
            a = a + b.astype(self.dtype)
        a = nn.softmax(a, axis=-1)
        a = a * mask[..., None].astype(a.dtype)
        c2 = self.param("cluster_weights2",
                        nn.initializers.normal(1.0 / jnp.sqrt(C)), (1, C, K))
        a_sum = jnp.sum(a, axis=1, keepdims=True)          # (B, 1, K)
        vlad = jnp.einsum("bnk,bnc->bkc", a, x)
        vlad = vlad - jnp.swapaxes(a_sum * c2.astype(self.dtype), 1, 2)
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(B, K * C)
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        out = dense(self.output_dim, self.dtype, name="hidden")(vlad)
        if self.gating:
            out = GatingContext(self.output_dim, self.add_batch_norm,
                                self.dtype)(out, train)
        return out


class FeatureMixerLayer(nn.Module):
    """Residual channel-MLP mixer layer (salsa.py:58-80)."""
    dim: int
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = dense(int(self.dim * self.mlp_ratio), self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = dense(self.dim, self.dtype)(h)
        return x + h


class Mixer(nn.Module):
    """SALSA MLP-mixer aggregator (salsa.py:83-111): L mixer layers,
    token-count projection k_in -> k_out, channel projection C -> out_d,
    flatten."""
    k_input_tokens: int
    k_output_tokens: int
    in_d: int
    out_d: int
    mix_depth: int = 4
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.mix_depth):
            x = FeatureMixerLayer(self.in_d, self.mlp_ratio, self.dtype,
                                  name=f"mix{i}")(x)
        x = jnp.swapaxes(x, 1, 2)
        x = dense(self.k_output_tokens, self.dtype, name="channel_proj")(x)
        x = jnp.swapaxes(x, 1, 2)
        x = dense(self.out_d, self.dtype, name="row_proj")(x)
        return x.reshape(x.shape[0], -1)


class PyramidAttnPool(nn.Module):
    """Shipped head (models/layers/pooling.py:106-233): per pyramid
    level, attention-pool the local features to k_j tokens, concat, and
    aggregate with the mixer ('mixer') or GeM ('gem')."""
    feature_size: int
    output_dim: int
    channels: Tuple[int, ...]
    k_pooled_tokens: Tuple[int, ...]
    aggregator: str = "mixer"
    mix_depth: int = 4
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens_per_level, masks_per_level,
                 deterministic=True):
        use_proj = any(c != self.feature_size for c in self.channels)
        pooled = []
        for j, (x, m) in enumerate(zip(tokens_per_level, masks_per_level)):
            t = AdaptivePooling(self.channels[j], self.k_pooled_tokens[j],
                                self.dtype, name=f"attpool{j}")(x, m)
            if use_proj and self.channels[j] != self.feature_size:
                t = dense(self.feature_size, self.dtype,
                          name=f"local_proj{j}")(t)
            pooled.append(t)
        t = jnp.concatenate(pooled, axis=1)      # (B, sum k, C)
        k_total = sum(self.k_pooled_tokens)
        if self.aggregator.lower() == "mixer":
            k_out = k_total // 4
            out_d = self.output_dim // k_out
            assert k_out * out_d == self.output_dim, (
                f"k_pooled_tokens {self.k_pooled_tokens} incompatible with "
                f"output_dim {self.output_dim}")
            return Mixer(k_total, k_out, self.feature_size, out_d,
                         self.mix_depth, self.mlp_ratio, self.dtype,
                         name="mixer")(t)
        elif self.aggregator.lower() == "gem":
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(t)
            h = Mlp(int(self.feature_size * self.mlp_ratio),
                    self.output_dim, 0.0, self.dtype)(h, deterministic)
            t = t + h
            full = jnp.ones(t.shape[:2], dtype=bool)
            return GeM(dtype=self.dtype)(t, full)
        raise ValueError(f"unknown aggregator {self.aggregator}")


class AttnPool(nn.Module):
    """Relay-token head (models/layers/pooling.py:235-305): attention-
    pool the combined multi-scale relay tokens to k tokens."""
    feature_size: int
    output_dim: int
    k_pooled_tokens: int
    aggregator: str = "mixer"
    mix_depth: int = 4
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rt, rt_mask, deterministic=True):
        t = AdaptivePooling(self.feature_size, self.k_pooled_tokens,
                            self.dtype, name="attpool")(rt, rt_mask)
        if self.aggregator.lower() == "mixer":
            k_out = self.k_pooled_tokens // 4
            out_d = self.output_dim // k_out
            return Mixer(self.k_pooled_tokens, k_out, self.feature_size,
                         out_d, self.mix_depth, self.mlp_ratio, self.dtype,
                         name="mixer")(t)
        elif self.aggregator.lower() == "gem":
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(t)
            h = Mlp(int(self.feature_size * self.mlp_ratio),
                    self.output_dim, 0.0, self.dtype)(h, deterministic)
            t = t + h
            full = jnp.ones(t.shape[:2], dtype=bool)
            return GeM(dtype=self.dtype)(t, full)
        raise ValueError(f"unknown aggregator {self.aggregator}")


class PyramidGeM(nn.Module):
    """Per-level GeM -> concat -> Linear+BN (-> gating)
    (PyramidOctGeMWrapper, models/layers/pooling.py:58-103)."""
    output_dim: int
    channels: Tuple[int, ...]
    gating: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens_per_level, masks_per_level,
                 train: bool = False):
        descs = [GeM(dtype=self.dtype, name=f"gem{j}")(x, m)
                 for j, (x, m) in enumerate(zip(tokens_per_level,
                                                masks_per_level))]
        g = jnp.concatenate(descs, axis=-1)
        g = dense(self.output_dim, self.dtype, use_bias=False,
                  name="linear")(g)
        g = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(g)
        if self.gating:
            g = GatingContext(self.output_dim, dtype=self.dtype)(g, train)
        return g
