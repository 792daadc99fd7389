"""HOTFormer backbone: conv stem, OctFormer stage, HOTFormer (RTSA+H-OSA)
stage.

Re-architecture of /root/reference/models/octformer_backbone.py:355-469
and /root/reference/models/hotformerloc_backbone.py:337-811 for the
per-sample static octree layout. The multi-scale relay-token tensor is a
static concat over pyramid levels — no ragged splits — and every stage
is jit-compiled end to end.

The HOTFormer block loop (num_blocks x [RTSA -> per-level H-OSA]) runs
under nn.scan with stacked per-iteration parameters: one traced
iteration instead of 10 unrolled ones (~10x smaller HLO / faster
compiles), composed with nn.remat for the reference's per-block gradient
checkpointing (models/hotformerloc_backbone.py:561-583).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.models.blocks import (HOTFormerBlock, OctFormerBlock,
                                            RelayTokenBlock)
from hotformerloc_tpu.models.config import ModelConfig
from hotformerloc_tpu.models.layers import (ADaPE, CPE, Downsample, Dtype,
                                            OctreeConvNormRelu,
                                            OctreeDownConvNormRelu, dense)
from hotformerloc_tpu.ops import window as ow
from hotformerloc_tpu.ops.plan import OctreePlan


def _remat(cfg: ModelConfig, target, **kw):
    """nn.remat with the config's selective policy (ModelConfig
    .remat_policy): the backward keeps the tagged hot outputs
    (checkpoint_name tags in models/attention.py / models/layers.py)
    instead of recomputing the attention kernels and CPE convs."""
    import jax
    policy = None
    if cfg.remat_policy == "save_attn":
        policy = jax.checkpoint_policies.save_only_these_names("attn_out")
    elif cfg.remat_policy == "save_hot":
        policy = jax.checkpoint_policies.save_only_these_names(
            "attn_out", "cpe_out")
    elif cfg.remat_policy is not None:
        raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
    return nn.remat(target, policy=policy, **kw)


class PatchEmbed(nn.Module):
    """Conv stem (models/octformer_backbone.py:416-453): num_down stages
    of [conv3 stride1 -> conv2 stride2] doubling channels from dim/2^n,
    then a conv3 projection to ``dim`` at the reduced depth."""
    dim: int
    num_down: int = 2
    downsample: bool = True
    conv_norm: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, plan: OctreePlan, train: bool = False):
        oc = plan.octree
        d = oc.depth
        if self.downsample:
            chans = [int(self.dim * 2**i)
                     for i in range(-self.num_down, 1)]
            for i in range(self.num_down):
                di = d - i
                ctx_i = plan.level_ctx(di)
                x = OctreeConvNormRelu(
                    chans[i], 27, self.conv_norm, self.dtype,
                    name=f"conv{i}")(x, ctx_i.neigh, oc.node_valid(di),
                                     train, band=ctx_i.band)
                x = OctreeDownConvNormRelu(
                    chans[i + 1], self.conv_norm, self.dtype,
                    name=f"down{i}")(x, plan.down_tables(di),
                                     oc.node_valid(di - 1), train)
            dp = d - self.num_down
            ctx_p = plan.level_ctx(dp)
            x = OctreeConvNormRelu(self.dim, 27, self.conv_norm, self.dtype,
                                   name="proj")(x, ctx_p.neigh,
                                                oc.node_valid(dp), train,
                                                band=ctx_p.band)
        else:
            ctx_d = plan.level_ctx(d)
            for i in range(self.num_down):
                x = OctreeConvNormRelu(
                    self.dim, 27, self.conv_norm, self.dtype,
                    name=f"conv{i}")(x, ctx_d.neigh, oc.node_valid(d),
                                     train, band=ctx_d.band)
        return x


class OctFormerStage(nn.Module):
    """num_blocks OctFormer blocks at one depth, alternating dilation
    1 / D on even / odd blocks (models/octformer_backbone.py:355-413)."""
    cfg: ModelConfig
    dim: int
    num_heads: int
    drop_paths: Tuple[float, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, deterministic=True, train=False):
        c = self.cfg
        if c.octf_use_rt:
            return self._rt_forward(x, ctx, deterministic, train)
        Block = OctFormerBlock
        if c.grad_checkpoint:
            Block = _remat(c, OctFormerBlock, static_argnums=(4, 5))
        for i, dp in enumerate(self.drop_paths):
            x = Block(self.dim, self.num_heads, c.patch_size,
                      1 if i % 2 == 0 else c.dilation, c.mlp_ratio,
                      not c.disable_rpe, c.conv_norm, c.layer_scale,
                      c.xcpe, c.proj_drop, c.attn_drop,
                      use_pallas=c.use_pallas_attn,
                      cpe_dense=(ctx.depth <= c.dense_cpe_max_depth),
                      dtype=self.dtype,
                      name=f"block{i}")(x, ctx, dp, deterministic, train)
        return x

    def _rt_forward(self, x, ctx, deterministic, train):
        """Ablation path (reference `use_rt` OctFormerBlock +
        RTAttentionOld, models/octformer_backbone.py:101-171,232-260):
        per-depth relay tokens, one per window, with per-depth RT
        self-attention before each windowed block; dilation disabled."""
        from hotformerloc_tpu.models.attention import TokenAttention
        c = self.cfg
        K = c.patch_size
        chunk = K // c.rt_size      # nodes summarised per relay token
        rt = ow.masked_window_mean(x, ctx.node_valid, chunk)
        wvalid = ow.window_valid(ctx.node_valid, chunk)
        HBlock = HOTFormerBlock
        if c.grad_checkpoint:
            HBlock = _remat(c, HOTFormerBlock, static_argnums=(5, 6))
        for i, dp in enumerate(self.drop_paths):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"rt_ln{i}")(rt)
            h = TokenAttention(self.dim, self.num_heads, c.attn_drop,
                               c.proj_drop, dtype=self.dtype,
                               name=f"rt_attn{i}")(h, wvalid, deterministic)
            rt = rt + h
            x, rt = HBlock(self.dim, self.num_heads, K, c.mlp_ratio,
                           not c.disable_rpe, c.conv_norm, c.layer_scale,
                           c.xcpe, c.proj_drop, c.attn_drop,
                           use_pallas=c.use_pallas_attn,
                           rt_per_window=c.rt_size,
                           cpe_dense=(ctx.depth <= c.dense_cpe_max_depth),
                           dtype=self.dtype,
                           name=f"block{i}")(x, rt, ctx, dp, deterministic,
                                             train)
        return x


class HOTFormerIteration(nn.Module):
    """One RTSA + per-level H-OSA iteration — the scanned unit of the
    HOTFormer stage (one pass of the loop at
    models/hotformerloc_backbone.py:558-595)."""
    cfg: ModelConfig
    channels: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    deterministic: bool
    train: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, ctxs, rt_mask, drop_rate):
        c = self.cfg
        K = c.patch_size
        chunk = K // c.rt_size      # nodes summarised per relay token
        L = c.num_pyramid_levels
        use_proj = c.use_projections
        max_ch = max(self.channels)
        max_heads = self.num_heads[self.channels.index(max_ch)]
        rt_comb, locals_ = carry
        widths = [ctx.node_valid.shape[1] // chunk for ctx in ctxs]

        rt_comb = RelayTokenBlock(
            max_ch, max_heads, c.mlp_ratio, c.layer_scale, c.proj_drop,
            c.attn_drop, dtype=self.dtype, name="rtsa")(
            rt_comb, rt_mask, drop_rate, self.deterministic)

        parts = []
        new_locals = []
        off = 0
        for j in range(L):
            rt_j = rt_comb[:, off:off + widths[j]]
            off += widths[j]
            if use_proj:
                rt_j = dense(self.channels[j], self.dtype,
                             name=f"down_proj{j}")(rt_j)
            x_j, rt_j = HOTFormerBlock(
                self.channels[j], self.num_heads[j], K, c.mlp_ratio,
                not c.disable_rpe, c.conv_norm, c.layer_scale, c.xcpe,
                c.proj_drop, c.attn_drop, last=False, rt_propagation=False,
                use_pallas=c.use_pallas_attn, rt_per_window=c.rt_size,
                cpe_dense=(ctxs[j].depth <= c.dense_cpe_max_depth),
                dtype=self.dtype,
                name=f"hosa{j}")(locals_[j], rt_j, ctxs[j], drop_rate,
                                 self.deterministic, self.train)
            if use_proj:
                rt_j = dense(max_ch, self.dtype, name=f"up_proj{j}")(rt_j)
            parts.append(rt_j)
            new_locals.append(x_j)
        return (jnp.concatenate(parts, axis=1), tuple(new_locals)), None


class HOTFormerStage(nn.Module):
    """The core stage: per-level relay-token init (+ADaPE), then
    num_blocks scanned iterations of [RTSA over all scales -> per-level
    H-OSA] (models/hotformerloc_backbone.py:337-597).

    Returns (local_feat_dict, relay_token_dict, rt_combined, rt_mask),
    keyed by octree depth.
    """
    cfg: ModelConfig
    channels: Tuple[int, ...]       # per pyramid level
    num_heads: Tuple[int, ...]
    drop_paths: Tuple[float, ...]   # per block
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, plan: OctreePlan, depth: int,
                 deterministic=True, train=False):
        c = self.cfg
        K = c.patch_size
        # ct_size/rt_size: G = c.rt_size relay tokens per window, each
        # summarising a contiguous chunk of K/G nodes (the reference
        # TokenInitialiser's view(-1, K//G, C) + nanmean,
        # models/hotformerloc_backbone.py:319-333). ADaPE stats are
        # computed per chunk here (the reference's per-window stats
        # shape-mismatch for rt_size>1 and no shipped config uses it).
        chunk = K // c.rt_size
        L = c.num_pyramid_levels
        depths = [depth - j for j in range(L)]
        oc = plan.octree
        ctxs = tuple(plan.level_ctx(d) for d in depths)
        use_proj = c.use_projections
        max_ch = max(self.channels)

        # ---- init pyramid locals (downsample chain) --------------------
        locals_ = [x]
        for j in range(L - 1):
            locals_.append(Downsample(
                self.channels[j + 1], c.conv_norm, self.dtype,
                name=f"downsample{j}")(
                    locals_[j], plan.down_tables(depths[j]),
                    oc.node_valid(depths[j + 1]), train))

        wvalids = [ow.window_valid(ctx.node_valid, chunk) for ctx in ctxs]
        widths = [v.shape[1] for v in wvalids]

        if c.disable_rt:
            # Ablation path: plain OctFormer blocks per level, dilation
            # re-enabled (models/hotformerloc_backbone.py:411-430).
            Block = OctFormerBlock
            if c.grad_checkpoint:
                Block = _remat(c, OctFormerBlock, static_argnums=(4, 5))
            for i, dp in enumerate(self.drop_paths):
                for j in range(L):
                    locals_[j] = Block(
                        self.channels[j], self.num_heads[j], K,
                        1 if i % 2 == 0 else c.dilation, c.mlp_ratio,
                        not c.disable_rpe, c.conv_norm, c.layer_scale,
                        c.xcpe, c.proj_drop, c.attn_drop,
                        use_pallas=c.use_pallas_attn,
                        cpe_dense=(ctxs[j].depth <= c.dense_cpe_max_depth),
                        dtype=self.dtype,
                        name=f"hosa_l{j}_b{i}")(
                            locals_[j], ctxs[j], dp, deterministic, train)
            local_dict = {d: f for d, f in zip(depths, locals_)}
            return local_dict, {d: None for d in depths}, None, None

        # ---- relay token init (masked window mean + ADaPE) -------------
        rts = []
        adape = ADaPE(max_ch, self.dtype, name="rt_adape") \
            if c.adape_mode else None
        # Without ADaPE the reference's RelayTokenInitialiser runs a CPE
        # over the window features before pooling (use_cpe = not
        # use_ADaPE, models/hotformerloc_backbone.py:476-487,322-323);
        # the CPE'd features feed ONLY the relay tokens, locals are
        # untouched. Shared across levels unless channels differ.
        rt_cpes = None
        if adape is None:
            if use_proj:
                rt_cpes = [CPE(self.channels[j], c.conv_norm, c.xcpe,
                               self.dtype,
                               dense_grid=(depths[j]
                                           <= c.dense_cpe_max_depth),
                               name=f"rt_init_cpe{j}")
                           for j in range(L)]
            else:
                shared = CPE(max_ch, c.conv_norm, c.xcpe, self.dtype,
                             name="rt_init_cpe")
                rt_cpes = [shared] * L
        for j, d in enumerate(depths):
            src = locals_[j]
            if rt_cpes is not None:
                src = rt_cpes[j](src, ctxs[j].neigh, ctxs[j].node_valid,
                                 train, ctx=ctxs[j])
            rt = ow.masked_window_mean(src, ctxs[j].node_valid, chunk)
            if adape is not None:
                stats = ow.window_stats(ctxs[j].xyz, ctxs[j].node_valid, d,
                                        chunk, c.adape_mode)
                pe = adape(stats, deterministic)
                if use_proj:
                    pe = dense(self.channels[j], self.dtype,
                               name=f"adape_proj{j}")(pe)
                rt = rt + pe
            if use_proj:
                rt = dense(max_ch, self.dtype, name=f"init_up_proj{j}")(rt)
            rts.append(rt)
        rt_comb = jnp.concatenate(rts, axis=1)        # (B, sum(W_j), C)
        rt_mask = jnp.concatenate(wvalids, axis=1)

        # ---- scanned RTSA + H-OSA loop --------------------------------
        Iter = HOTFormerIteration
        if c.grad_checkpoint:
            Iter = _remat(c, HOTFormerIteration)
        ScanIter = nn.scan(
            Iter,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True, "droppath": True},
            in_axes=(nn.broadcast, nn.broadcast, 0),
            length=len(self.drop_paths))
        rates = jnp.asarray(self.drop_paths, jnp.float32)
        (rt_comb, locals_t), _ = ScanIter(
            c, tuple(self.channels), tuple(self.num_heads), deterministic,
            train, self.dtype, name="iter")(
            (rt_comb, tuple(locals_)), ctxs, rt_mask, rates)
        locals_ = list(locals_t)

        # ---- optional relay-token propagation (the reference applies it
        # inside the last H-OSA block, models/hotformerloc_backbone.py:
        # 196-206; post-loop application is equivalent) ------------------
        if c.rt_propagation:
            off = 0
            for j, d in enumerate(depths):
                rt_j = rt_comb[:, off:off + widths[j]]
                off += widths[j]
                if use_proj:
                    rt_j = dense(self.channels[j], self.dtype,
                                 name=f"prop_down_proj{j}")(rt_j)
                up = jnp.repeat(rt_j, chunk, axis=1)
                up = jnp.where(ctxs[j].node_valid[..., None], up, 0)
                if c.rt_propagation_scale is not None:
                    g = self.param(f"rt_gamma_propagate{j}",
                                   nn.initializers.constant(
                                       c.rt_propagation_scale), ())
                    up = up * g.astype(self.dtype)
                locals_[j] = locals_[j] + up

        local_dict = {d: f for d, f in zip(depths, locals_)}
        splits = []
        off = 0
        for wj in widths:
            splits.append(rt_comb[:, off:off + wj])
            off += wj
        rt_dict = {d: r for d, r in zip(depths, splits)}
        return local_dict, rt_dict, rt_comb, rt_mask


class HOTFormerBase(nn.Module):
    """Stem -> OctFormer levels -> HOTFormer stage
    (models/hotformerloc_backbone.py:600-685)."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, plan: OctreePlan, deterministic=True,
                 train=False):
        c = self.cfg
        oc = plan.octree
        octf_ch, pyr_ch = c.stage_channels()
        octf_h, pyr_h = c.stage_heads()
        rates = c.drop_path_rates()

        feat = PatchEmbed(c.channels[0], c.stem_down,
                          c.downsample_input_embeddings, c.conv_norm,
                          self.dtype, name="patch_embed")(feat, plan, train)
        d = c.transformer_depth
        used = 0
        for i in range(c.num_octf_levels):
            nb = c.num_blocks[i]
            feat = OctFormerStage(c, octf_ch[i], octf_h[i],
                                  rates[used:used + nb], self.dtype,
                                  name=f"octf_stage{i}")(
                feat, plan.level_ctx(d), deterministic, train)
            used += nb
            feat = Downsample(c.channels[i + 1], c.conv_norm, self.dtype,
                              name=f"octf_down{i}")(
                feat, plan.down_tables(d), oc.node_valid(d - 1), train)
            d -= 1
        return HOTFormerStage(c, pyr_ch, pyr_h,
                              rates[used:used + c.num_blocks[-1]],
                              self.dtype, name="hotf_stage")(
            feat, plan, d, deterministic, train)
