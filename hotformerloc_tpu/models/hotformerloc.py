"""HOTFormerLoc-TPU: raw point clouds -> 256-d place-recognition
descriptors, end to end inside one jit.

Top-level equivalent of /root/reference/models/hotformerloc.py:18-83 and
model_factory.py:25-76, with one crucial TPU-first difference: octree
construction, neighbour tables, and the attention plan are computed on
device from the (B, P, 3) point tensor, so the host pipeline ships only
points and the whole step compiles to a single XLA program.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from hotformerloc_tpu.models.backbone import HOTFormerBase
from hotformerloc_tpu.models.config import ModelConfig
from hotformerloc_tpu.models.pooling import (AttnPool, GeM, PyramidAttnPool,
                                             PyramidGeM)
from hotformerloc_tpu.octree.build import build_batched_octree
from hotformerloc_tpu.ops.plan import OctreePlan, build_plan

Dtype = Any


def input_features(octree, feature_str: str = "P") -> jnp.ndarray:
    """Per-leaf input features ~ ocnn.modules.InputFeature
    (consumed at models/hotformerloc.py:28-31). 'N' = mean per-point
    normal of the leaf octant (3ch); 'D' = norm of the displacement from
    the octant centre in voxel units (1ch); 'L' = that displacement
    (3ch); 'P' = mean point position in the global [-1, 1] frame (3ch).
    Channels are assembled in ocnn's canonical N, D, L, P order
    regardless of the string order (ocnn Octree.get_input_feature).
    Padding leaves get zeros."""
    from hotformerloc_tpu.octree import morton
    feats = []
    valid = octree.node_valid(octree.depth)[..., None]
    if "N" in feature_str:
        assert octree.leaf_normal is not None, (
            "input feature 'N' needs per-point normals: pass normals to "
            "build_batched_octree / HOTFormerLoc.__call__")
        feats.append(jnp.where(valid, octree.leaf_normal, 0.0))
    if "L" in feature_str or "D" in feature_str:
        centre = morton.grid_to_points(
            octree.xyz(octree.depth).astype(jnp.float32) + 0.5,
            octree.depth)
        scale = 2.0 ** (octree.depth - 1)   # voxel units, as in ocnn
        disp = (octree.leaf_mean - centre) * scale
        if "D" in feature_str:
            feats.append(jnp.where(
                valid, jnp.linalg.norm(disp, axis=-1, keepdims=True), 0.0))
        if "L" in feature_str:
            feats.append(jnp.where(valid, disp, 0.0))
    if "P" in feature_str:
        feats.append(jnp.where(valid, octree.leaf_mean, 0.0))
    assert feats, f"no valid input features in '{feature_str}'"
    return jnp.concatenate(feats, axis=-1)


def feature_channels(feature_str: str) -> int:
    n = 0
    for f in feature_str:
        n += {"P": 3, "L": 3, "D": 1, "N": 3}[f]
    return n


class HOTFormerLoc(nn.Module):
    """points (B, P, 3) in [-1,1] + mask (B, P) -> {'global': (B, D)}."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points, pmask, deterministic: bool = True,
                 train: bool = False, normals=None, plan=None):
        c = self.cfg
        if plan is None:
            if "N" in c.input_features and normals is None:
                raise ValueError("input feature 'N' requires a (B, P, 3) "
                                 "normals argument")
            octree = build_batched_octree(points, pmask, c.octree_depth,
                                          c.min_depth,
                                          c.resolve_capacities(),
                                          normals=normals)
            plan = build_plan(octree, c.band_depths(), c.band_tile,
                              c.band_halo, c.dense_depths())
        octree = plan.octree
        feat = input_features(octree, c.input_features).astype(self.dtype)

        local_dict, rt_dict, rt_comb, rt_mask = HOTFormerBase(
            c, self.dtype, name="backbone")(feat, plan, deterministic, train)

        pyr_depths = c.pyramid_depths
        _, pyr_ch = c.stage_channels()
        if c.pooling == "PyramidAttnPoolMixer":
            toks = [local_dict[d] for d in pyr_depths]
            masks = [octree.node_valid(d) for d in pyr_depths]
            x = PyramidAttnPool(c.feature_size, c.output_dim, tuple(pyr_ch),
                                tuple(c.k_pooled_tokens), "mixer",
                                dtype=self.dtype, name="pooling")(
                toks, masks, deterministic)
        elif c.pooling in ("AttnPoolMixer", "AttnPoolGeM"):
            assert not c.disable_rt, (
                "relay-token pooling requires relay tokens "
                "(models/model_factory.py:60-64)")
            agg = "mixer" if c.pooling == "AttnPoolMixer" else "gem"
            k = (c.k_pooled_tokens if isinstance(c.k_pooled_tokens, int)
                 else sum(c.k_pooled_tokens))
            x = AttnPool(c.feature_size, c.output_dim, k, agg,
                         dtype=self.dtype, name="pooling")(
                rt_comb, rt_mask, deterministic)
        elif c.pooling == "OctGeM":
            d = max(pyr_depths)
            x = GeM(dtype=self.dtype, name="pooling")(
                local_dict[d], octree.node_valid(d))
        elif c.pooling in ("PyramidOctGeM", "PyramidOctGeMgc"):
            toks = [local_dict[d] for d in pyr_depths]
            masks = [octree.node_valid(d) for d in pyr_depths]
            x = PyramidGeM(c.output_dim, tuple(pyr_ch),
                           gating=c.pooling.endswith("gc"),
                           dtype=self.dtype, name="pooling")(
                toks, masks, train)
        else:
            raise NotImplementedError(f"pooling {c.pooling}")

        x = x.astype(jnp.float32)
        assert x.ndim == 2 and x.shape[1] == c.output_dim
        if c.normalize_embeddings:
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        # Nodes silently dropped by capacity overflow (0 with the default
        # worst-case caps; the train step surfaces this in its stats so
        # occupancy-tuned capacities can never lose accuracy unnoticed).
        # band_overflow is reported as its OWN stat: a nonzero value
        # means banded-conv escape-capacity misses (conv exactness
        # degrades), distinct from octree node-capacity drops.
        return {"global": x,
                "octree_overflow": jnp.sum(octree.overflow),
                "band_overflow": plan.band_overflow()}


def param_count(params) -> int:
    import jax
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
