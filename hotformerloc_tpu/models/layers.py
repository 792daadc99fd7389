"""Core NN layers: MLP, norms, CPE/xCPE, RPE, ADaPE, DropPath.

TPU-native re-implementations of the reference layer zoo
(/root/reference/models/layers/octformer_layers.py). Modules are
flax.linen with fp32 params and a configurable compute dtype (bfloat16 on
TPU); layer semantics follow the reference, layout follows our
per-sample static octree arrays.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.ops import conv as oconv

Dtype = Any

# trunc_normal(std=0.02) matches the reference's global Linear init
# (models/hotformerloc_backbone.py:779-783).
trunc_normal = nn.initializers.truncated_normal


def dense(feat: int, dtype: Dtype, use_bias: bool = True,
          name: Optional[str] = None, std: float = 0.02) -> nn.Dense:
    return nn.Dense(feat, use_bias=use_bias, dtype=dtype,
                    kernel_init=trunc_normal(std),
                    bias_init=nn.initializers.zeros, name=name)


class Mlp(nn.Module):
    """Two-layer GELU MLP (models/layers/octformer_layers.py:38-59)."""
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = dense(self.hidden, self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out, self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid octree nodes only.

    The reference's BatchNorm1d sees only real (ragged) nodes; with our
    padded layout the batch statistics must exclude padding.

    momentum follows torch BatchNorm1d semantics: torch's momentum=0.1
    updates running = 0.9*running + 0.1*batch, i.e. m=0.9 here.
    """
    features: int
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, use_running_average: bool = True):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if valid is None:
                red = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=red)
                var = jnp.var(xf, axis=red)
            else:
                w = valid.astype(jnp.float32)[..., None]
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w, axis=tuple(range(x.ndim - 1))) / n
                var = jnp.sum(w * (xf - mean) ** 2,
                              axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class Norm(nn.Module):
    """Post-conv norm factory ~ get_norm_layer
    (models/layers/octformer_layers.py:22-35). 'layernorm' is what every
    shipped config uses; 'batchnorm' masks out padding nodes."""
    features: int
    kind: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        if self.kind == "layernorm":
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        elif self.kind == "batchnorm":
            return MaskedBatchNorm(self.features, dtype=self.dtype)(
                x, valid, use_running_average=not train)
        elif self.kind == "powernorm":
            # PowerNorm (models/layers/mask_powernorm.py): normalise by the
            # running second moment instead of batch variance.
            return PowerNorm(self.features, dtype=self.dtype)(
                x, valid, use_running_average=not train)
        raise ValueError(f"unknown norm kind {self.kind}")


def _group_scaling(xf: jnp.ndarray, group_num: int,
                   eps: float) -> jnp.ndarray:
    """GroupScaling1D (mask_powernorm.py:17-37): divide every position by
    the sqrt of its channel-group second moment."""
    C = xf.shape[-1]
    cg = C // group_num
    g = xf.reshape(*xf.shape[:-1], group_num, cg)
    m2 = jnp.mean(g * g, axis=-1, keepdims=True)
    return (g / jnp.sqrt(m2 + eps)).reshape(xf.shape)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _power_core(xs, denom, var, ema_gz, abkw):
    """z = xs * rsqrt(denom + eps-folded-in) with the PowerNorm paper's
    APPROXIMATE backward (PowerFunction, mask_powernorm.py:43-95): the
    denominator is treated as a constant (no grad through var), and
    gx = (g - (1 - abkw) * ema_gz * z) * rsqrt(var) — always the BATCH
    var, even when the forward normalised by running_phi."""
    return xs * jax.lax.rsqrt(denom)


def _power_core_fwd(xs, denom, var, ema_gz, abkw):
    z = xs * jax.lax.rsqrt(denom)
    return z, (z, var, ema_gz)


def _power_core_bwd(abkw, res, g):
    z, var, ema_gz = res
    gx = (g - (1.0 - abkw) * ema_gz * z) * jax.lax.rsqrt(var)
    return gx, None, None, None


_power_core.defvjp(_power_core_fwd, _power_core_bwd)


class PowerNorm(nn.Module):
    """MaskPowerNorm (/root/reference/models/layers/mask_powernorm.py:97-180;
    unused by any shipped config, provided for feature parity):
    GroupScaling -> normalise by the masked batch second moment during
    warmup / by running_phi after -> affine, with the PowerNorm paper's
    approximate custom backward (PowerFunction, :43-95).

    One documented deviation: the reference mutates its `ema_gz` buffer
    INSIDE torch's backward pass; a functional JAX VJP cannot write
    module state, so `ema_gz` keeps its value between explicit updates
    (zeros unless an outer training loop threads it). The backward
    formula itself honours whatever `ema_gz` holds, and at ema_gz = 0 it
    equals the reference's first-step backward exactly.
    """
    features: int
    eps: float = 1e-5
    alpha_fwd: float = 0.9
    alpha_bkw: float = 0.9
    warmup_iters: int = 10000
    group_num: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, use_running_average: bool = True):
        phi = self.variable("batch_stats", "running_phi",
                            lambda: jnp.ones(self.features, jnp.float32))
        ema_gz = self.variable("batch_stats", "ema_gz",
                               lambda: jnp.zeros(self.features, jnp.float32))
        iters = self.variable("batch_stats", "iters",
                              lambda: jnp.zeros((), jnp.int32))
        weight = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.astype(jnp.float32)
        xs = _group_scaling(xf, self.group_num, self.eps)
        if use_running_average:
            z = xs * jax.lax.rsqrt(phi.value + self.eps)
        else:
            it = iters.value + 1
            if valid is None:
                var = jnp.mean(xs * xs, axis=tuple(range(x.ndim - 1)))
            else:
                w = valid.astype(jnp.float32)[..., None]
                n = jnp.maximum(jnp.sum(w), 1.0)
                var = jnp.sum(xs * xs * w,
                              axis=tuple(range(x.ndim - 1))) / n
            denom = jnp.where(it <= self.warmup_iters, var, phi.value) \
                + self.eps
            z = _power_core(xs, denom, var + self.eps, ema_gz.value,
                            self.alpha_bkw)
            if not self.is_initializing():
                # running_phi update sequence (mask_powernorm.py:68-70):
                # a cumulative average during warmup, then the EMA step
                # UNCONDITIONALLY on top of it.
                itf = it.astype(jnp.float32)
                phi1 = jnp.where(it < self.warmup_iters,
                                 phi.value * (itf - 1.0) / itf + var / itf,
                                 phi.value)
                phi.value = (self.alpha_fwd * phi1
                             + (1.0 - self.alpha_fwd) * var)
                iters.value = it
        y = z * weight + bias
        return y.astype(self.dtype)


conv_kernel_init = nn.initializers.variance_scaling(1.0, "fan_in",
                                                    "truncated_normal")


def _band_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stride1_conv(x, neigh, w, b, band):
    """Stride-1 full conv, banded Pallas path when the level carries
    band tables and the shape is viable (ops/pallas/band_conv.py);
    exact-equal flat-gather path otherwise."""
    from hotformerloc_tpu.ops.pallas import band_conv as bc
    N, C = x.shape[1], x.shape[-1]
    if band is not None and bc.band_viable(N, C, band.tile):
        loc = bc._band_loc(neigh, band.tile, band.halo)
        return bc.banded_conv(x, loc, w, b, band, _band_interpret())
    return oconv.octree_conv(x, neigh, w, b)


def _stride1_dwconv(x, neigh, w, band):
    """Depthwise analogue of _stride1_conv."""
    from hotformerloc_tpu.ops.pallas import band_conv as bc
    N, C = x.shape[1], x.shape[-1]
    if band is not None and bc.band_viable(N, C, band.tile):
        loc = bc._band_loc(neigh, band.tile, band.halo)
        return bc.banded_dwconv(x, loc, w, band, _band_interpret())
    return oconv.octree_dwconv(x, neigh, w)


def _down_triple(down):
    """Accept either a bare children table or the full
    (children, parent, octant) triple from OctreePlan.down_tables —
    the inverse tables unlock the scatter-free backward (ops/conv.py)."""
    if isinstance(down, (tuple, list)):
        return down
    return down, None, None


class OctreeConvNormRelu(nn.Module):
    """Stride-1 octree conv + norm + ReLU
    (models/layers/octformer_layers.py:80-99)."""
    out_channels: int
    taps: int = 27
    conv_norm: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, neigh, valid=None, train: bool = False,
                 band=None):
        w = self.param("kernel", conv_kernel_init,
                       (self.taps, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = _stride1_conv(x, neigh, w.astype(self.dtype),
                          b.astype(self.dtype), band)
        y = Norm(self.out_channels, self.conv_norm, self.dtype)(
            y, valid, train)
        return nn.relu(y)


class OctreeDownConvNormRelu(nn.Module):
    """Kernel-[2] stride-2 conv + norm + ReLU (stem downsample)."""
    out_channels: int
    conv_norm: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, down, valid=None, train: bool = False):
        children, parent, octant = _down_triple(down)
        w = self.param("kernel", conv_kernel_init,
                       (8, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = oconv.octree_down_conv(x, children, w.astype(self.dtype),
                                   b.astype(self.dtype), parent, octant)
        y = Norm(self.out_channels, self.conv_norm, self.dtype)(
            y, valid, train)
        return nn.relu(y)


class OctreeDeconvNormRelu(nn.Module):
    """Kernel-[2] stride-2 transposed conv + norm + ReLU
    (models/layers/octformer_layers.py:101-119 — imported by the
    reference backbone but unused in shipped configs; provided for
    parity). Upsamples depth-(d-1) features onto depth-d nodes.

    Init note: each output node receives exactly ONE tap (its parent via
    one octant slice), so the effective fan-in is Cin, not 8*Cin; the
    variance_scaling scale of 8 compensates for the (8, Cin, Cout)
    parameter shape."""
    out_channels: int
    conv_norm: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, parent, octant, valid=None, train: bool = False):
        deconv_init = nn.initializers.variance_scaling(
            8.0, "fan_in", "truncated_normal")
        w = self.param("kernel", deconv_init,
                       (8, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = oconv.octree_deconv(x, parent, octant, w.astype(self.dtype),
                                b.astype(self.dtype))
        y = Norm(self.out_channels, self.conv_norm, self.dtype)(
            y, valid, train)
        return nn.relu(y)


class Downsample(nn.Module):
    """Inter-stage downsample: kernel-[2] stride-2 conv + norm, no ReLU
    (models/octformer_backbone.py:456-469)."""
    out_channels: int
    conv_norm: str = "layernorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, down, valid=None, train: bool = False):
        children, parent, octant = _down_triple(down)
        w = self.param("kernel", conv_kernel_init,
                       (8, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = oconv.octree_down_conv(x, children, w.astype(self.dtype),
                                   b.astype(self.dtype), parent, octant)
        return Norm(self.out_channels, self.conv_norm, self.dtype)(
            y, valid, train)


class CPE(nn.Module):
    """Conditional positional encoding: depthwise octree conv + norm
    (models/layers/octformer_layers.py:122-142). ``xcpe=True`` swaps the
    dwconv for a full conv + linear (PointTransformerV3 style).

    ``dense=True`` routes the dwconv through the dense voxel-grid
    formulation (ops/conv.octree_dwconv_dense) — numerically equal,
    gather-free, and much faster at coarse depths; requires ``ctx``
    (the LevelCtx carrying keys/counts/xyz/depth).
    """
    dim: int
    conv_norm: str = "layernorm"
    xcpe: bool = False
    dtype: Dtype = jnp.float32
    dense_grid: bool = False

    @nn.compact
    def __call__(self, x, neigh, valid=None, train: bool = False,
                 ctx=None):
        band = getattr(ctx, "band", None) if ctx is not None else None
        if self.xcpe:
            w = self.param("kernel", conv_kernel_init,
                           (27, self.dim, self.dim))
            b = self.param("bias", nn.initializers.zeros, (self.dim,))
            y = _stride1_conv(x, neigh, w.astype(self.dtype),
                              b.astype(self.dtype), band)
            y = dense(self.dim, self.dtype, name="linear")(y)
        else:
            w = self.param("dw_kernel", conv_kernel_init, (27, self.dim, 1))
            wd = w[..., 0].astype(self.dtype)
            if self.dense_grid and ctx is not None and ctx.keys is not None:
                y = oconv.octree_dwconv_dense(
                    x, ctx.keys, ctx.counts, ctx.xyz, ctx.node_valid, wd,
                    ctx.depth,
                    vox_idx=getattr(ctx, "dense_idx", None))
            else:
                y = _stride1_dwconv(x, neigh, wd, band)
        # selective-remat tag: with remat_policy 'save_hot' the backward
        # keeps the conv output instead of re-running the banded/dense
        # conv kernels (models/backbone._remat)
        from jax.ad_checkpoint import checkpoint_name
        y = checkpoint_name(y, "cpe_out")
        return Norm(self.dim, self.conv_norm, self.dtype)(y, valid, train)


class RPE(nn.Module):
    """Relative position bias (models/layers/octformer_layers.py:144-174).

    Table of 3*(2*pos_bnd+1) rows x heads; per-axis lookups summed over
    x/y/z. pos_bnd = int(0.8 * patch_size * sqrt(dilation)).
    """
    patch_size: int
    num_heads: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @property
    def pos_bnd(self) -> int:
        return int(0.8 * self.patch_size * self.dilation**0.5)

    @nn.compact
    def __call__(self, rel_pos):
        # rel_pos: (B, W, K, K, 3) int32 -> (B, W, H, K, K) bias
        bnd = self.pos_bnd
        num = 2 * bnd + 1
        table = self.param("rpe_table", trunc_normal(0.02),
                           (3 * num, self.num_heads))
        idx = jnp.clip(rel_pos, -bnd, bnd) + bnd
        idx = idx + jnp.arange(3, dtype=jnp.int32) * num
        out = jnp.take(table.astype(self.dtype), idx, axis=0)
        out = jnp.sum(out, axis=-2)  # sum over xyz -> (B, W, K, K, H)
        return jnp.moveaxis(out, -1, 2)


class ADaPE(nn.Module):
    """Absolute distribution-aware position encoding: MLP over window
    mean/cov stats (models/layers/octformer_layers.py:177-210)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, stats, deterministic: bool = True):
        return Mlp(self.dim, self.dim, 0.0, self.dtype)(
            stats.astype(self.dtype), deterministic)


class DropPath(nn.Module):
    """Per-sample stochastic depth.

    The reference's OctreeDropPath
    (models/layers/octformer_layers.py:213-289) spends most of its code
    resolving which batch element each ragged token belongs to; with the
    per-sample layout the batch axis is axis 0 and this collapses to the
    classic timm formulation. The rate is a __call__ argument (possibly
    traced) so block loops can be nn.scan-ed with per-iteration rates.
    """
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, rate, deterministic: bool = True):
        if deterministic or (isinstance(rate, float) and rate <= 0.0):
            return x
        keep = 1.0 - jnp.asarray(rate, jnp.float32)
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        if self.scale_by_keep:
            mask = mask / jnp.maximum(keep, 1e-6).astype(x.dtype)
        return x * mask
