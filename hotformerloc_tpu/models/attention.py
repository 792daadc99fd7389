"""Attention modules: windowed H-OSA attention, relay-token RTSA, pooling.

Replaces OctreeAttention (/root/reference/models/octformer_backbone.py:24-98)
and RTAttention (/root/reference/models/hotformerloc_backbone.py:27-98).
All attentions run as fixed-shape batched einsums that map straight onto
the MXU; logits/softmax are computed in fp32 regardless of the compute
dtype. Masking uses key-validity only — per-sample layout means no
cross-batch leakage is possible.

WindowAttention has two execution paths sharing identical parameters:
the XLA einsum formulation, and the fused Pallas kernel
(ops/pallas/window_attn.py) that never materialises logits or the RPE
bias in HBM (`use_pallas=True`).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.models.layers import Dtype, dense, trunc_normal
from hotformerloc_tpu.ops.window import MASK_VALUE


def masked_softmax(logits: jnp.ndarray, key_mask: jnp.ndarray,
                   mask_batch_dims: int) -> jnp.ndarray:
    """Softmax over the last axis with boolean key masking in fp32.

    key_mask broadcasts over the leading ``mask_batch_dims`` dims of
    logits (e.g. heads, query axis).
    """
    logits = logits.astype(jnp.float32)
    add = jnp.where(key_mask, 0.0, MASK_VALUE).astype(jnp.float32)
    add = jnp.expand_dims(
        add, axis=tuple(range(key_mask.ndim - 1,
                              key_mask.ndim - 1 + mask_batch_dims)))
    return jax.nn.softmax(logits + add, axis=-1)


def rpe_pos_bnd(patch_size: int, dilation: int) -> int:
    """pos_bnd = int(0.8 * K * sqrt(D))
    (models/layers/octformer_layers.py:155-156)."""
    return int(0.8 * patch_size * dilation**0.5)


# Window-tile / pack overrides for the on-chip A/B tool
# (tools/pallas_ab.py); None = automatic choice.
_FORCED_WINDOW_TILE: Optional[int] = None
_FORCED_PACK: Optional[int] = None


def _pick_pack(bw: int, T: int) -> int:
    """Windows fused per kernel row block (ops/pallas/window_attn.py):
    pack*T tokens share one row block with a block-diagonal mask.
    On-chip A/B (docs/PALLAS_AB_r5.json): pack=2/wt8 is a WASH vs the
    proven pack=1/wt16 (hosa fwd+bwd 7.31 vs 7.42 ms, octf 3.20 vs
    3.07), and pack=2/wt16 crashes Mosaic (same rows/tile as the wt32
    crash) — Mosaic already pipelines batched small dots well, and the
    kernel's FLOPs are dominated by the RPE bias expand, which packing
    does not shrink. Default stays 1; the packed path is kept
    (interpret-tested) for shapes where a larger row block is the only
    way to reach 8-row sublane alignment."""
    if _FORCED_PACK is not None and bw % _FORCED_PACK == 0:
        return _FORCED_PACK
    return 1


def _pick_window_tile(bw: int, limit: int = 8) -> Optional[int]:
    # Mosaic block rule: the sublane block dim must be a multiple of 8
    # (or equal the full array dim), so tiles below 8 only when the
    # whole array is one block.
    if _FORCED_WINDOW_TILE is not None and bw % _FORCED_WINDOW_TILE == 0:
        return _FORCED_WINDOW_TILE
    # wt=16 used to crash the remote Mosaic backend at the hosa shape
    # (tools/mosaic_probe.py attn); after the fused-dtab backward
    # restructure it compiles and is 10-15% faster than 8
    # (docs/PALLAS_AB_r4.json). wt=32 still crashes Mosaic.
    if bw % 16 == 0:
        return 16
    if bw % 8 == 0:
        return 8
    # Fallback: the whole (B*W) axis as one block. Mosaic only accepts
    # sublane blocks that are multiples of 8 OR the full dim, and a
    # single huge block risks a VMEM-limit failure — so cap it: above
    # the cap the caller falls back to the XLA attention path instead
    # (None). Every shipped config rounds window counts to multiples of
    # 8 (resolve_capacities: block_num = patch_size*dilation with
    # patch_size >= 8), so this path is test-/toy-shape only.
    if bw > 512:
        return None
    return bw


class WindowAttention(nn.Module):
    """Windowed MHSA over (B, W, T, C) tokens, T = rt_per_window + K.

    With rt_per_window G > 0 this is HAT attention: G relay slots are
    prepended to each window and excluded from the RPE bias (zero-padded,
    as in apply_rpe, models/octformer_backbone.py:87-94).

    Args to __call__: x (B, W, T, C); key_mask (B, W, T) bool; xyz_w
    (B, W, K, 3) int32 window node coords (None disables RPE).
    """
    dim: int
    num_heads: int
    patch_size: int
    dilation: int = 1
    rt_per_window: int = 0
    use_rpe: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    use_pallas: bool = False
    # Static coordinate range (2^depth) of xyz_w. When set, the RPE bias
    # uses the scatter-free custom adjoint (ops/rpe.py); when None it
    # falls back to plain autodiff through the table gather.
    coord_range: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask, xyz_w=None, deterministic=True):
        B, W, T, C = x.shape
        H = self.num_heads
        G = self.rt_per_window
        K = T - G
        hd = C // H
        bnd = rpe_pos_bnd(self.patch_size, self.dilation)
        use_rpe = self.use_rpe and xyz_w is not None
        qkv = dense(3 * C, self.dtype, use_bias=self.qkv_bias,
                    name="qkv")(x)
        table = None
        if use_rpe:
            table = self.param("rpe_table", trunc_normal(0.02),
                               (3 * (2 * bnd + 1), H))

        pack = _pick_pack(B * W, T)
        wt = _pick_window_tile(B * W // pack)
        can_fuse = (self.use_pallas and wt is not None and
                    (deterministic or (self.attn_drop == 0.0)))
        if can_fuse:
            from hotformerloc_tpu.ops.pallas.window_attn import \
                fused_window_attention
            qkv_f = qkv.reshape(B * W, T, 3, C)
            q = qkv_f[:, :, 0]
            k = qkv_f[:, :, 1]
            v = qkv_f[:, :, 2]
            if use_rpe:
                xyz_p = jnp.moveaxis(xyz_w, 3, 2).reshape(B * W, 3, K)
                if G > 0 and pack > 1:
                    # sentinel layout (pack > 1 only): relay slots carry
                    # coord -1 -> zero one-hot row -> zero bias row/col.
                    # For pack == 1 the kernel G-pads the (K, K) bias
                    # instead — T = K + G rows with P < 128 lanes is a
                    # Mosaic-rejected layout (window_attn.py docstring).
                    sent = jnp.full((B * W, 3, G), -1, jnp.int32)
                    xyz_p = jnp.concatenate([sent, xyz_p], axis=2)
                tab = table.astype(jnp.float32)
            else:
                xyz_p = jnp.zeros((B * W, 3, T), jnp.int32)
                tab = jnp.zeros((3, H), jnp.float32)
            mask_i = key_mask.reshape(B * W, T).astype(jnp.int32)
            if pack > 1:
                BWp = B * W // pack
                q = q.reshape(BWp, pack * T, C)
                k = k.reshape(BWp, pack * T, C)
                v = v.reshape(BWp, pack * T, C)
                mask_i = mask_i.reshape(BWp, pack * T)
                xyz_p = (xyz_p.reshape(BWp, pack, 3, T)
                         .swapaxes(1, 2).reshape(BWp, 3, pack * T))
            interp = jax.default_backend() != "tpu"
            cr = self.coord_range
            if cr is None and use_rpe:
                raise ValueError(
                    "use_pallas with RPE requires coord_range (2^depth): "
                    "the table gradient's one-hot decomposition must "
                    "statically bound the window coords")
            if cr is None:
                cr = 1
            out = fused_window_attention(q, k, v, xyz_p, mask_i, tab, H,
                                         pack, bnd, use_rpe, wt, interp, cr)
            out = out.reshape(B, W, T, C)
            # selective-remat tag: with remat_policy 'save_attn'/
            # 'save_hot' the backward keeps this instead of re-running
            # the kernel forward (models/backbone._remat)
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, "attn_out")
        else:
            qkv = qkv.reshape(B, W, T, 3, H, hd)
            q, k, v = (qkv[..., 0, :, :], qkv[..., 1, :, :],
                       qkv[..., 2, :, :])
            scale = hd ** -0.5
            logits = jnp.einsum("bwthd,bwshd->bwhts", q, k,
                                preferred_element_type=jnp.float32) * scale
            if use_rpe:
                # rel-pos bias: per-axis table rows summed over x/y/z
                # (RPE, models/layers/octformer_layers.py:144-174).
                # Gathers read the transposed (H, 3*num) table so every
                # temp keeps K (not H or 3) as the minor dim — a
                # (..., 3, H) layout tile-pads ~21x on TPU and was the
                # dominant HBM allocation of the whole train step. With
                # coord_range set, the table-gradient is matmuls instead
                # of a scatter-add (ops/rpe.py).
                from hotformerloc_tpu.ops.rpe import (rpe_bias,
                                                      rpe_bias_reference)
                tab_t = table.astype(self.dtype).T         # (H, 3*num)
                if self.coord_range is not None:
                    bias = rpe_bias(tab_t, xyz_w, bnd, self.coord_range)
                else:
                    bias = rpe_bias_reference(tab_t, xyz_w, bnd)
                if G > 0:
                    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0),
                                          (G, 0), (G, 0)))
                logits = logits + bias.astype(jnp.float32)
            attn = masked_softmax(logits, key_mask, 2)
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            out = jnp.einsum("bwhts,bwshd->bwthd", attn.astype(self.dtype),
                             v)
            out = out.reshape(B, W, T, C)
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, "attn_out")
        out = dense(C, self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class TokenAttention(nn.Module):
    """Global masked MHSA over (B, M, C) tokens — the RTSA core
    (models/hotformerloc_backbone.py:27-98)."""
    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask, deterministic=True):
        B, M, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = dense(3 * C, self.dtype, use_bias=self.qkv_bias,
                    name="qkv")(x)
        qkv = qkv.reshape(B, M, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        attn = masked_softmax(logits, key_mask, 2)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(self.dtype), v)
        out = out.reshape(B, M, C)
        out = dense(C, self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class AdaptivePooling(nn.Module):
    """SALSA-style attentional pooling: k learnable queries attend over
    input tokens (/root/reference/models/layers/salsa.py:12-55)."""
    feature_dim: int
    k_pooled_tokens: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask):
        # x: (B, M, C), key_mask: (B, M) -> (B, k, C)
        B, M, C = x.shape
        q = self.param("query", nn.initializers.normal(1.0),
                       (self.k_pooled_tokens, self.feature_dim))
        logits = jnp.einsum("kc,bmc->bkm", q.astype(self.dtype), x,
                            preferred_element_type=jnp.float32)
        logits = logits * self.feature_dim ** -0.5
        attn = masked_softmax(logits, key_mask, 1)
        return jnp.einsum("bkm,bmc->bkc", attn.astype(self.dtype), x)
