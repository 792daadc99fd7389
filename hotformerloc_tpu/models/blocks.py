"""Transformer blocks: OctFormer (local), H-OSA (window+relay), RTSA.

Re-designs of /root/reference/models/octformer_backbone.py:174-291 and
/root/reference/models/hotformerloc_backbone.py:101-273 on the
per-sample static layout. A relay token (RT) is one learnable summary
slot per attention window; H-OSA attends over [RT | window nodes], RTSA
attends globally over the multi-scale RT set, which here is a simple
static concatenation (the reference's ragged concat_and_pad_rt /
unpad_and_split_rt CPU machinery, models/relay_token_utils.py:12-79,
disappears entirely).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.models.attention import TokenAttention, WindowAttention
from hotformerloc_tpu.models.layers import (ADaPE, CPE, DropPath, Dtype, Mlp,
                                            dense)
from hotformerloc_tpu.ops import window as ow
from hotformerloc_tpu.ops.plan import LevelCtx


class LayerScale(nn.Module):
    """Optional learnable per-channel residual scale (CaiT style),
    models/octformer_backbone.py:219-221."""
    dim: int
    init: Optional[float]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.init is None:
            return x
        g = self.param("gamma",
                       nn.initializers.constant(self.init), (self.dim,))
        return x * g.astype(self.dtype)


class OctFormerBlock(nn.Module):
    """Plain windowed block (no relay tokens): CPE -> window MHSA -> MLP.

    Alternating blocks use dilated windows
    (models/octformer_backbone.py:174-291,379-381).
    """
    dim: int
    num_heads: int
    patch_size: int
    dilation: int = 1
    mlp_ratio: float = 4.0
    use_rpe: bool = True
    conv_norm: str = "layernorm"
    layer_scale: Optional[float] = None
    xcpe: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    cpe_dense: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: LevelCtx, drop_path=0.0,
                 deterministic: bool = True, train: bool = False):
        K, D = self.patch_size, self.dilation
        x = x + CPE(self.dim, self.conv_norm, self.xcpe, self.dtype,
                    dense_grid=self.cpe_dense)(
            x, ctx.neigh, ctx.node_valid, train, ctx=ctx)
        xw = ow.data_to_windows(x, K, D)
        key_mask = ow.window_key_mask(ctx.node_valid, K, D)
        xyz_w = ow.data_to_windows(ctx.xyz, K, D) if self.use_rpe else None

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(xw)
        h = WindowAttention(self.dim, self.num_heads, K, D, 0, self.use_rpe,
                            self.attn_drop, self.proj_drop,
                            use_pallas=self.use_pallas,
                            coord_range=2 ** ctx.depth,
                            dtype=self.dtype)(h, key_mask, xyz_w,
                                              deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        xw = xw + DropPath()(h, drop_path, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(xw)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.proj_drop,
                self.dtype)(h, deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        xw = xw + DropPath()(h, drop_path, deterministic)
        return ow.windows_to_data(xw, K, D)


class HOTFormerBlock(nn.Module):
    """H-OSA block: CPE -> concat RT into window -> MHSA -> split RT back.

    models/hotformerloc_backbone.py:101-207. Dilation is always 1 when
    relay tokens are active (hard-disabled there at :122-124). On the
    last block of a stage, optionally propagates RT features back into
    the local map (rt_propagation, :196-206).
    """
    dim: int
    num_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    use_rpe: bool = True
    conv_norm: str = "layernorm"
    layer_scale: Optional[float] = None
    xcpe: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    last: bool = False
    rt_propagation: bool = False
    rt_propagation_scale: Optional[float] = None
    use_pallas: bool = False
    rt_per_window: int = 1   # ct_size/rt_size: G relay slots per window
    cpe_dense: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rt, ctx: LevelCtx, drop_path=0.0,
                 deterministic: bool = True, train: bool = False):
        # x: (B, N, C) locals; rt: (B, W*G, C) relay tokens of this
        # level, G = rt_per_window, RT g of window w at row w*G+g (each
        # RT summarises a contiguous K/G-node chunk, matching the
        # reference TokenInitialiser's view(-1, K//G, C) layout,
        # models/hotformerloc_backbone.py:319-333).
        K, G = self.patch_size, self.rt_per_window
        x = x + CPE(self.dim, self.conv_norm, self.xcpe, self.dtype,
                    dense_grid=self.cpe_dense)(
            x, ctx.neigh, ctx.node_valid, train, ctx=ctx)
        xw = ow.data_to_windows(x, K)                       # (B, W, K, C)
        B, W = xw.shape[:2]
        node_mask_w = ow.window_key_mask(ctx.node_valid, K)  # (B, W, K)
        # RT g is valid iff its K/G-node chunk has a valid node.
        rt_valid = jnp.any(node_mask_w.reshape(B, W, G, K // G), axis=-1)
        rt_w = rt.reshape(B, W, G, -1)
        t = jnp.concatenate([rt_w, xw], axis=2)             # (B, W, G+K, C)
        key_mask = jnp.concatenate([rt_valid, node_mask_w], axis=2)
        xyz_w = ow.data_to_windows(ctx.xyz, K) if self.use_rpe else None

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(t)
        h = WindowAttention(self.dim, self.num_heads, K, 1, G, self.use_rpe,
                            self.attn_drop, self.proj_drop,
                            use_pallas=self.use_pallas,
                            coord_range=2 ** ctx.depth,
                            dtype=self.dtype)(h, key_mask, xyz_w,
                                              deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        t = t + DropPath()(h, drop_path, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(t)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.proj_drop,
                self.dtype)(h, deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        t = t + DropPath()(h, drop_path, deterministic)

        rt = t[:, :, :G, :].reshape(B, W * G, -1)
        x = ow.windows_to_data(t[:, :, G:, :], K)
        if self.last and self.rt_propagation:
            # Broadcast each RT to its K/G chunk nodes, masked to valid
            # nodes (reference nearest-upsample + rt_init_mask path).
            up = jnp.repeat(rt, K // G, axis=1)             # (B, W*K, C)
            up = jnp.where(ctx.node_valid[..., None], up, 0)
            if self.rt_propagation_scale is not None:
                g = self.param("rt_gamma_propagate",
                               nn.initializers.constant(
                                   self.rt_propagation_scale), ())
                up = up * g.astype(self.dtype)
            x = x + up
        return x, rt


class RelayTokenBlock(nn.Module):
    """RTSA block over the combined multi-scale relay tokens
    (models/hotformerloc_backbone.py:210-273): pre-LN attention + MLP on
    (B, M, C) with a key-validity mask."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: Optional[float] = None
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rt, rt_mask, drop_path=0.0,
                 deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(rt)
        h = TokenAttention(self.dim, self.num_heads, self.attn_drop,
                           self.proj_drop, dtype=self.dtype)(
            h, rt_mask, deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        rt = rt + DropPath()(h, drop_path, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(rt)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.proj_drop,
                self.dtype)(h, deterministic)
        h = LayerScale(self.dim, self.layer_scale, self.dtype)(h)
        rt = rt + DropPath()(h, drop_path, deterministic)
        return rt
