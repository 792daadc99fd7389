"""Model configuration — static hyperparameters of HOTFormerLoc-TPU.

Mirrors the reference's ModelParams schema
(/root/reference/misc/utils.py:15-101) plus the octree/static-shape
settings our TPU layout needs (point budget, per-depth capacities).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from hotformerloc_tpu.octree.build import default_capacities, round_up


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model: str = "HOTFormerLoc"
    # backbone
    in_channels: int = 3
    channels: Tuple[int, ...] = (128, 256)
    num_blocks: Tuple[int, ...] = (4, 10)
    num_heads: Tuple[int, ...] = (8, 16)
    num_pyramid_levels: int = 3
    num_octf_levels: int = 1
    patch_size: int = 48
    dilation: int = 4
    drop_path: float = 0.5
    mlp_ratio: float = 4.0
    stem_down: int = 2
    downsample_input_embeddings: bool = True
    rt_size: int = 1
    rt_propagation: bool = False
    rt_propagation_scale: Optional[float] = None
    disable_rt: bool = False
    # ablation: per-depth relay tokens inside the OctFormer stage
    # (reference use_rt + RTAttentionOld path)
    octf_use_rt: bool = False
    adape_mode: Optional[str] = "cov"     # None | 'pos' | 'var' | 'cov'
    disable_rpe: bool = False
    conv_norm: str = "layernorm"
    layer_scale: Optional[float] = None
    xcpe: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    # pooling head
    pooling: str = "PyramidAttnPoolMixer"
    feature_size: int = 256
    output_dim: int = 256
    k_pooled_tokens: Tuple[int, ...] = (74, 36, 18)
    normalize_embeddings: bool = True
    input_features: str = "P"
    # execution
    # Fused Pallas window attention: ON by default per the on-chip A/B
    # (docs/PALLAS_AB.json, v5e): hosa 5.5x fwd / 2.8x fwd+bwd, octf
    # 8.8x / 4.4x vs the XLA einsum path. CPU runs use interpret mode.
    use_pallas_attn: bool = True
    # Depths at or below this run the CPE depthwise conv on a dense
    # voxel grid (V = 8^d) instead of 27-tap row gathers — numerically
    # equal, gather-free (ops/conv.octree_dwconv_dense). Measured win
    # region on v5e is V <= 4k (depth 4: 4.6 ms fwd); at depth 5 the
    # 32^3 grid costs 30.8 ms/call standalone vs 4.8 ms for the banded
    # kernel (docs/COMPONENT_PROFILE.json r4), so depth 5 now rides the
    # band path.
    dense_cpe_max_depth: int = 4
    # Banded Pallas conv path for the remaining stride-1 27-tap convs
    # (CPE + stem): per-tile one-hot MXU selection over a VMEM halo band
    # replaces the ~70 GB/s flat HBM gather; exact via escape patching
    # (ops/pallas/band_conv.py, A/B in docs/GATHER_AB.json).
    # HR=128 is the measured-fastest halo (docs/COMPONENT_PROFILE.json);
    # band_tile is the PREFERRED tile — plan building picks the largest
    # of {128, 64} dividing each level's capacity (S=128 fills MXU rows:
    # 3.31 vs 4.19 ms fwd at C=256 on chip). Hard-node fraction ~2.8%
    # on real Oxford tables vs the 12.5% capacity (overflow counted in
    # stats either way).
    use_band_conv: bool = True
    band_tile: int = 128
    band_halo: int = 128
    # octree / static shapes
    octree_depth: int = 9
    num_points: int = 4096
    capacities: Optional[Tuple[int, ...]] = None  # per depth from min_depth
    grad_checkpoint: bool = True
    # Selective remat (VERDICT r4 #2: all-or-nothing per-block remat
    # double-paid the forward, ~25% of the step). With grad_checkpoint
    # on, the policy picks what the backward may KEEP instead of
    # recomputing:
    #   None        — full remat (the r1-r4 behaviour; lowest memory)
    #   'save_attn' — keep fused-attention outputs ('attn_out' tags)
    #   'save_hot'  — keep attention AND CPE-conv outputs (both tags;
    #                 the two measured-hot recompute families,
    #                 docs/PROFILE.md)
    # The reference remats whole blocks and pays the forward twice
    # (models/hotformerloc_backbone.py:561-583).
    remat_policy: Optional[str] = "save_hot"

    def __post_init__(self):
        # patch_size must be divisible by ct_size/rt_size (reference
        # assert, models/hotformerloc_backbone.py:310).
        if self.rt_size < 1 or self.patch_size % self.rt_size != 0:
            raise ValueError(
                f"patch_size ({self.patch_size}) must be divisible by "
                f"ct_size/rt_size ({self.rt_size})")
        bad = set(self.input_features) - set("NDLP")
        if bad:
            raise ValueError(
                f"invalid input features {sorted(bad)}; must be in "
                "['L','P','D','N'] (models/model_factory.py:9-23). "
                "'N' additionally requires per-point normals passed to "
                "the model call.")

    # -- derived ---------------------------------------------------------
    @property
    def num_stages(self) -> int:
        return self.num_octf_levels + self.num_pyramid_levels

    @property
    def transformer_depth(self) -> int:
        """Finest depth seen by the transformer (after the stem)."""
        d = self.octree_depth
        if self.downsample_input_embeddings:
            d -= self.stem_down
        return d

    @property
    def min_depth(self) -> int:
        return self.transformer_depth - self.num_stages + 1

    @property
    def pyramid_depths(self) -> Tuple[int, ...]:
        d0 = self.transformer_depth - self.num_octf_levels
        return tuple(d0 - j for j in range(self.num_pyramid_levels))

    @property
    def block_num(self) -> int:
        return self.patch_size * self.dilation

    def resolve_capacities(self) -> Tuple[int, ...]:
        """Per-depth node capacities (index 0 == min_depth).

        Transformer depths must be multiples of patch_size*dilation so
        window partition is a reshape; stem-only depths need no rounding
        beyond 8.
        """
        if self.capacities is not None:
            caps = self.capacities
            want = self.octree_depth - self.min_depth + 1
            if len(caps) != want:
                raise ValueError(
                    f"capacities needs one entry per depth "
                    f"{self.min_depth}..{self.octree_depth} ({want}), "
                    f"got {len(caps)}")
        else:
            caps = default_capacities(self.num_points, self.octree_depth,
                                      self.min_depth, multiple_of=8)
        caps = list(caps)
        for d in range(self.min_depth, self.transformer_depth + 1):
            i = d - self.min_depth
            caps[i] = round_up(caps[i], self.block_num)
        return tuple(caps)

    def stage_channels(self) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        """(octf_channels, pyramid_channels); pyramid list broadcast to
        num_pyramid_levels when a single value is given (the
        use_projections=False path of HOTFormerStage,
        models/hotformerloc_backbone.py:355-362)."""
        octf = self.channels[:self.num_octf_levels]
        pyr = self.channels[self.num_octf_levels:]
        if len(pyr) == 1:
            pyr = pyr * self.num_pyramid_levels
        assert len(pyr) == self.num_pyramid_levels
        return octf, pyr

    def stage_heads(self) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        octf = self.num_heads[:self.num_octf_levels]
        pyr = self.num_heads[self.num_octf_levels:]
        if len(pyr) == 1:
            pyr = pyr * self.num_pyramid_levels
        assert len(pyr) == self.num_pyramid_levels
        return octf, pyr

    @property
    def use_projections(self) -> bool:
        pyr = self.channels[self.num_octf_levels:]
        return len(pyr) > 1 and not self.disable_rt

    def band_depths(self) -> Tuple[int, ...]:
        """Depths whose stride-1 convs use the banded Pallas path:
        every gather depth above the dense-grid cutoff whose capacity
        the band tile divides (ops/pallas/band_conv.band_viable)."""
        if not self.use_band_conv:
            return ()
        caps = self.resolve_capacities()
        out = []
        for d in range(self.min_depth, self.octree_depth + 1):
            n = caps[d - self.min_depth]
            # viability at the smallest tile (64); the plan build picks
            # the largest dividing tile per level (band_conv.pick_tile)
            if d > self.dense_cpe_max_depth and n % 64 == 0 and n >= 256:
                out.append(d)
        return tuple(out)

    def dense_depths(self) -> Tuple[int, ...]:
        """Depths whose CPE runs the dense voxel-grid path — their
        voxel->node maps are hoisted into the plan (build_plan
        dense_depths) so the serial lookup isn't replayed per block."""
        return tuple(d for d in range(self.min_depth,
                                      self.transformer_depth + 1)
                     if d <= self.dense_cpe_max_depth)

    def drop_path_rates(self) -> Tuple[float, ...]:
        """Per-block linearly increasing stochastic depth
        (models/hotformerloc_backbone.py:632)."""
        total = sum(self.num_blocks)
        if total <= 1:
            return (0.0,) * total
        return tuple(self.drop_path * i / (total - 1) for i in range(total))


def oxford_config(**overrides) -> ModelConfig:
    """HOTFormerLoc-Oxford (models/hotformerloc_oxford_cfg.txt).

    Capacities are occupancy-tuned (p99.9 * 1.1 over a 512-cloud uniform
    corpus — the distribution-free near-worst case; real clustered lidar
    sits below it): tools/measure_occupancy.py,
    docs/OCCUPANCY_oxford_uniform.json. Overflow, if any data ever
    exceeds them, is counted on device (BatchedOctree.overflow) and
    logged as stats['octree_overflow'].
    """
    kw = dict(octree_depth=9, num_points=4096, patch_size=48,
              capacities=(2688, 4224, 4224, 4224, 4096, 4096))
    kw.update(overrides)
    return ModelConfig(**kw)


def cs_wild_places_config(**overrides) -> ModelConfig:
    """HOTFormerLoc-CSWildPlaces (models/hotformerloc_cs-wild-places_cfg.txt).

    Capacities: see oxford_config — docs/OCCUPANCY_cs-wild-places_uniform.json.
    """
    kw = dict(octree_depth=7, num_points=4096, patch_size=64,
              capacities=(256, 512, 2816, 4096, 4096, 4096))
    kw.update(overrides)
    return ModelConfig(**kw)


def tiny_test_config(**overrides) -> ModelConfig:
    """Small config for unit tests / dry runs."""
    kw = dict(channels=(32, 64), num_blocks=(2, 2), num_heads=(2, 4),
              num_pyramid_levels=2, num_octf_levels=1, patch_size=8,
              dilation=2, octree_depth=6, num_points=512,
              k_pooled_tokens=(12, 4), feature_size=64, output_dim=64,
              grad_checkpoint=False)
    kw.update(overrides)
    return ModelConfig(**kw)
