"""Convert reference HOTFormerLoc torch checkpoints to this framework.

Maps the reference's `model.state_dict()` (/root/reference/models/*, torch
module tree) onto our flax param pytree, so users of the reference can
bring their trained `.pth` / `.ckpt` weights to TPU unchanged:

  python -m hotformerloc_tpu.tools.convert_reference_weights \
      --weights hotformerloc_oxford.pth \
      --model_config configs/oxford_model.txt --octree_depth 9 \
      --out weights/Oxford/converted

Scope: the shipped configurations (PyramidAttnPoolMixer head, ADaPE,
single pyramid channel width -> no up/down projections, layernorm
conv_norm, no layer_scale). Transforms applied:
  * torch Linear weight (out, in) -> flax kernel (in, out) transpose;
  * torch LayerNorm weight/bias -> flax scale/bias;
  * ocnn OctreeConv `weights` -> (kdim, Cin, Cout) kernel (reshaped from
    ocnn's flattened (kdim*Cin, Cout) if needed); missing conv biases
    (ocnn default use_bias=False) become zeros;
  * dwconv CPE `weights` -> (27, C, 1) dw_kernel;
  * per-block HOTFormer params are STACKED along a leading axis to fill
    the nn.scan'd iteration (backbone/hotf_stage/iter/*), blocks i=0..9.

Tap-order assumption: both frameworks enumerate 3x3x3 conv taps in
raster order (dz fastest; octree/neigh.py kernel_offsets) and stride-2
children in octant order 4x+2y+z. If a converted model shows degraded
accuracy, permute axis 0 of the conv kernels accordingly.
"""
from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _normalize_key(k: str) -> str:
    """Real checkpoints nest HOTFormerBase under the HOTFormer wrapper
    (`backbone.backbone.*`, models/hotformerloc_backbone.py:688-811);
    fold that onto the single `backbone.*` namespace used below."""
    if k.startswith("backbone.backbone."):
        return "backbone." + k[len("backbone.backbone."):]
    return k


class Converter:
    def __init__(self, state_dict: Dict[str, np.ndarray], cfg):
        self.sd = {_normalize_key(k): np.asarray(v)
                   for k, v in state_dict.items()}
        self.cfg = cfg
        self.used = set()
        self.out: Dict = {}

    # -- helpers ----------------------------------------------------------
    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"reference checkpoint is missing '{key}'")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def put(self, path: str, value: np.ndarray):
        node = self.out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value, np.float32)

    def conv_kernel(self, key: str, kdim: int, cin: int,
                    cout: int) -> np.ndarray:
        w = self.take(key)
        if w.ndim == 2:                      # ocnn flattened (kdim*Cin, Cout)
            w = w.reshape(kdim, cin, cout)
        assert w.shape == (kdim, cin, cout), (key, w.shape)
        return w

    def map_conv(self, src: str, dst: str, kdim: int, cin: int, cout: int,
                 norm: bool = True):
        """OctreeConvNormRelu / Downsample: conv.weights [+bias] + norm."""
        self.put(f"{dst}/kernel", self.conv_kernel(f"{src}.conv.weights",
                                                   kdim, cin, cout))
        if self.has(f"{src}.conv.bias"):
            self.put(f"{dst}/bias", self.take(f"{src}.conv.bias"))
        else:
            self.put(f"{dst}/bias", np.zeros(cout, np.float32))
        if norm:
            self.map_norm(f"{src}.norm", f"{dst}/Norm_0/LayerNorm_0")

    def map_norm(self, src: str, dst: str):
        self.put(f"{dst}/scale", self.take(f"{src}.weight"))
        self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def map_linear(self, src: str, dst: str):
        self.put(f"{dst}/kernel", _t(self.take(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self.put(f"{dst}/bias", self.take(f"{src}.bias"))

    def map_cpe(self, src: str, dst: str, dim: int):
        w = self.take(f"{src}.conv.weights")
        assert w.size == 27 * dim, (src, w.shape)
        self.put(f"{dst}/dw_kernel", w.reshape(27, dim, 1))
        self.map_norm(f"{src}.norm", f"{dst}/Norm_0/LayerNorm_0")

    def map_window_block(self, src: str, dst: str, dim: int):
        """OctFormerBlock / HOTFormerBlock torch names -> our blocks."""
        self.map_cpe(f"{src}.cpe", f"{dst}/CPE_0", dim)
        self.map_norm(f"{src}.norm1", f"{dst}/LayerNorm_0")
        self.map_linear(f"{src}.attention.qkv",
                        f"{dst}/WindowAttention_0/qkv")
        self.map_linear(f"{src}.attention.proj",
                        f"{dst}/WindowAttention_0/proj")
        if self.has(f"{src}.attention.rpe.rpe_table"):
            self.put(f"{dst}/WindowAttention_0/rpe_table",
                     self.take(f"{src}.attention.rpe.rpe_table"))
        self.map_norm(f"{src}.norm2", f"{dst}/LayerNorm_1")
        self.map_linear(f"{src}.mlp.fc1", f"{dst}/Mlp_0/fc1")
        self.map_linear(f"{src}.mlp.fc2", f"{dst}/Mlp_0/fc2")

    # -- model ------------------------------------------------------------
    def convert(self) -> Dict:
        c = self.cfg
        octf_ch, pyr_ch = c.stage_channels()
        L = c.num_pyramid_levels
        nb = c.num_blocks[-1]
        max_ch = max(pyr_ch)

        # stem (PatchEmbed, octformer_backbone.py:416-453)
        chans = [int(c.channels[0] * 2 ** i)
                 for i in range(-c.stem_down, 1)]
        for i in range(c.stem_down):
            cin = c.in_channels if i == 0 else chans[i]
            self.map_conv(f"backbone.patch_embed.convs.{i}",
                          f"backbone/patch_embed/conv{i}", 27, cin, chans[i])
            self.map_conv(f"backbone.patch_embed.downsamples.{i}",
                          f"backbone/patch_embed/down{i}", 8, chans[i],
                          chans[i + 1])
        self.map_conv("backbone.patch_embed.proj",
                      "backbone/patch_embed/proj", 27, chans[-1],
                      c.channels[0])

        # octf stages + downsamples
        for i in range(c.num_octf_levels):
            dim = octf_ch[i]
            for k in range(c.num_blocks[i]):
                self.map_window_block(f"backbone.octf_stage.{i}.blocks.{k}",
                                      f"backbone/octf_stage{i}/block{k}",
                                      dim)
            nxt = (octf_ch + pyr_ch)[i + 1]
            self.map_conv(f"backbone.downsample.{i}",
                          f"backbone/octf_down{i}", 8, dim, nxt)

        # HOTFormer stage: stack per-block params into the scanned iter
        def stack(srcs, map_one):
            """Run map_one per block into a scratch tree, stack leaves."""
            trees = []
            for s in srcs:
                scratch = Converter.__new__(Converter)
                scratch.sd, scratch.used = self.sd, self.used
                scratch.cfg, scratch.out = self.cfg, {}
                map_one(scratch, s)
                trees.append(scratch.out)

            def merge(dst, items):
                for k in items[0]:
                    vals = [t[k] for t in items]
                    if isinstance(vals[0], dict):
                        merge(dst.setdefault(k, {}), vals)
                    else:
                        dst[k] = np.stack(vals, axis=0)
            merge(self.out.setdefault("backbone", {})
                  .setdefault("hotf_stage", {}).setdefault("iter", {}),
                  trees)

        for j in range(L):
            dim = pyr_ch[j]

            def one_hosa(cv, src, dim=dim, j=j):
                cv.map_window_block(src, f"hosa{j}", dim)
            stack([f"backbone.hotf_stage.hosa_blocks.{j}.{i}"
                   for i in range(nb)], one_hosa)

        def one_rtsa(cv, src):
            cv.map_norm(f"{src}.norm1", "rtsa/LayerNorm_0")
            cv.map_linear(f"{src}.rt_attention.qkv",
                          "rtsa/TokenAttention_0/qkv")
            cv.map_linear(f"{src}.rt_attention.proj",
                          "rtsa/TokenAttention_0/proj")
            cv.map_norm(f"{src}.norm2", "rtsa/LayerNorm_1")
            cv.map_linear(f"{src}.mlp.fc1", "rtsa/Mlp_0/fc1")
            cv.map_linear(f"{src}.mlp.fc2", "rtsa/Mlp_0/fc2")
        stack([f"backbone.hotf_stage.rtsa_blocks.{i}" for i in range(nb)],
              one_rtsa)

        if c.adape_mode:
            self.map_linear("backbone.hotf_stage.rt_adape.mlp.fc1",
                            "backbone/hotf_stage/rt_adape/Mlp_0/fc1")
            self.map_linear("backbone.hotf_stage.rt_adape.mlp.fc2",
                            "backbone/hotf_stage/rt_adape/Mlp_0/fc2")
        else:
            # No ADaPE -> the RelayTokenInitialiser carries a CPE
            # (use_cpe = not use_ADaPE, hotformerloc_backbone.py:476-487)
            if c.use_projections:
                for j in range(L):
                    self.map_cpe(
                        f"backbone.hotf_stage.relay_tokeniser.{j}.cpe",
                        f"backbone/hotf_stage/rt_init_cpe{j}", pyr_ch[j])
            else:
                self.map_cpe("backbone.hotf_stage.relay_tokeniser.cpe",
                             "backbone/hotf_stage/rt_init_cpe", max_ch)
        for j in range(L - 1):
            self.map_conv(f"backbone.hotf_stage.downsamples.{j}",
                          f"backbone/hotf_stage/downsample{j}", 8,
                          pyr_ch[j], pyr_ch[j + 1])

        # pooling head (PyramidAttnPoolWrapper, pooling.py:106-233)
        if c.pooling == "PyramidAttnPoolMixer":
            for j in range(L):
                self.put(f"pooling/attpool{j}/query",
                         self.take(f"pooling.pooling.attpool.{j}.query"))
            mix_depth = 4
            for m in range(mix_depth):
                base = f"pooling.pooling.descriptor_extractor.mix.{m}.mix"
                dst = f"pooling/mixer/mix{m}"
                self.map_norm(f"{base}.0", f"{dst}/LayerNorm_0")
                self.map_linear(f"{base}.1", f"{dst}/Dense_0")
                self.map_linear(f"{base}.3", f"{dst}/Dense_1")
            self.map_linear("pooling.pooling.descriptor_extractor.row_proj",
                            "pooling/mixer/row_proj")
            self.map_linear(
                "pooling.pooling.descriptor_extractor.channel_proj",
                "pooling/mixer/channel_proj")
        else:
            raise NotImplementedError(
                f"conversion for pooling={c.pooling} not implemented")

        unused = [k for k in self.sd
                  if k not in self.used and "num_batches_tracked" not in k]
        if unused:
            print(f"[convert] WARNING: {len(unused)} reference params "
                  f"unused, e.g. {unused[:5]}")
        return self.out


def convert_state_dict(state_dict: Dict[str, np.ndarray], cfg) -> Dict:
    """Reference torch state_dict (numpy values) -> flax params tree."""
    return Converter(state_dict, cfg).convert()


def validate_against_model(params: Dict, cfg) -> None:
    """Check the converted tree matches the model's init shapes exactly."""
    import jax
    import jax.numpy as jnp

    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
    model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
    pts = jnp.zeros((1, cfg.num_points, 3), jnp.float32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), pts,
                         jnp.ones((1, cfg.num_points), bool))["params"]

    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(params)[0]

    def name(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)
    ref_d = {name(p): l.shape for p, l in flat_ref}
    new_d = {name(p): l.shape for p, l in flat_new}
    missing = sorted(set(ref_d) - set(new_d))
    extra = sorted(set(new_d) - set(ref_d))
    bad = sorted(k for k in set(ref_d) & set(new_d)
                 if tuple(ref_d[k]) != tuple(new_d[k]))
    if missing or extra or bad:
        raise ValueError(
            f"converted tree mismatch: missing={missing[:8]} "
            f"extra={extra[:8]} shape={[(k, ref_d[k], new_d[k]) for k in bad[:8]]}")


def synthesize_reference_state_dict(cfg, seed: int = 0):
    """Random state_dict with the reference's exact key names/shapes
    (for differential tests without the real torch model; shapes follow
    /root/reference/models/*.py as cited in the class docstrings)."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def add(key, *shape):
        sd[key] = rng.normal(0, 0.02, shape).astype(np.float32)

    def add_linear(base, cin, cout, bias=True):
        add(f"{base}.weight", cout, cin)
        if bias:
            add(f"{base}.bias", cout)

    def add_norm(base, dim):
        add(f"{base}.weight", dim)
        add(f"{base}.bias", dim)

    def add_conv(base, kdim, cin, cout, bias=False, norm=True):
        add(f"{base}.conv.weights", kdim * cin, cout)   # ocnn flattened
        if bias:
            add(f"{base}.conv.bias", cout)
        if norm:
            add_norm(f"{base}.norm", cout)

    def add_block(base, dim, heads, K, D):
        add_norm(f"{base}.norm1", dim)
        add_linear(f"{base}.attention.qkv", dim, 3 * dim)
        add_linear(f"{base}.attention.proj", dim, dim)
        bnd = int(0.8 * K * D ** 0.5)
        add(f"{base}.attention.rpe.rpe_table", 3 * (2 * bnd + 1), heads)
        add_norm(f"{base}.norm2", dim)
        hid = int(dim * cfg.mlp_ratio)
        add_linear(f"{base}.mlp.fc1", dim, hid)
        add_linear(f"{base}.mlp.fc2", hid, dim)
        sd[f"{base}.cpe.conv.weights"] = rng.normal(
            0, 0.02, (27, 1, dim)).astype(np.float32)   # dwconv layout
        add_norm(f"{base}.cpe.norm", dim)

    c = cfg
    octf_ch, pyr_ch = c.stage_channels()
    octf_h, pyr_h = c.stage_heads()
    L = c.num_pyramid_levels
    nb = c.num_blocks[-1]
    K = c.patch_size

    chans = [int(c.channels[0] * 2 ** i) for i in range(-c.stem_down, 1)]
    for i in range(c.stem_down):
        cin = c.in_channels if i == 0 else chans[i]
        add_conv(f"backbone.backbone.patch_embed.convs.{i}", 27, cin, chans[i])
        add_conv(f"backbone.backbone.patch_embed.downsamples.{i}", 8, chans[i],
                 chans[i + 1])
    add_conv("backbone.backbone.patch_embed.proj", 27, chans[-1], c.channels[0])

    for i in range(c.num_octf_levels):
        for k in range(c.num_blocks[i]):
            add_block(f"backbone.backbone.octf_stage.{i}.blocks.{k}", octf_ch[i],
                      octf_h[i], K, 1 if k % 2 == 0 else c.dilation)
        add_conv(f"backbone.backbone.downsample.{i}", 8, octf_ch[i],
                 (octf_ch + pyr_ch)[i + 1], bias=True)

    for j in range(L):
        for i in range(nb):
            add_block(f"backbone.backbone.hotf_stage.hosa_blocks.{j}.{i}",
                      pyr_ch[j], pyr_h[j], K, 1)
    max_ch = max(pyr_ch)
    max_h = pyr_h[pyr_ch.index(max_ch)]
    for i in range(nb):
        base = f"backbone.backbone.hotf_stage.rtsa_blocks.{i}"
        add_norm(f"{base}.norm1", max_ch)
        add_linear(f"{base}.rt_attention.qkv", max_ch, 3 * max_ch)
        add_linear(f"{base}.rt_attention.proj", max_ch, max_ch)
        add_norm(f"{base}.norm2", max_ch)
        hid = int(max_ch * c.mlp_ratio)
        add_linear(f"{base}.mlp.fc1", max_ch, hid)
        add_linear(f"{base}.mlp.fc2", hid, max_ch)
    if c.adape_mode:
        in_feat = {"pos": 3, "var": 6, "cov": 9}[c.adape_mode]
        add_linear("backbone.backbone.hotf_stage.rt_adape.mlp.fc1", in_feat, max_ch)
        add_linear("backbone.backbone.hotf_stage.rt_adape.mlp.fc2", max_ch, max_ch)
    else:
        base = "backbone.backbone.hotf_stage.relay_tokeniser"
        sd[f"{base}.cpe.conv.weights"] = rng.normal(
            0, 0.02, (27, 1, max_ch)).astype(np.float32)
        add_norm(f"{base}.cpe.norm", max_ch)
    for j in range(L - 1):
        add_conv(f"backbone.backbone.hotf_stage.downsamples.{j}", 8, pyr_ch[j],
                 pyr_ch[j + 1], bias=True)

    for j in range(L):
        add(f"pooling.pooling.attpool.{j}.query", c.k_pooled_tokens[j],
            pyr_ch[j])
    fs = c.feature_size
    for m in range(4):
        base = f"pooling.pooling.descriptor_extractor.mix.{m}.mix"
        add_norm(f"{base}.0", fs)
        add_linear(f"{base}.1", fs, fs)
        add_linear(f"{base}.3", fs, fs)
    k_out = sum(c.k_pooled_tokens) // 4
    add_linear("pooling.pooling.descriptor_extractor.row_proj", fs,
               c.output_dim // k_out)
    add_linear("pooling.pooling.descriptor_extractor.channel_proj",
               sum(c.k_pooled_tokens), k_out)
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="reference .pth (bare state_dict) or .ckpt")
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--octree_depth", type=int, default=9)
    ap.add_argument("--num_points", type=int, default=4096)
    ap.add_argument("--out", required=True,
                    help="output orbax checkpoint directory")
    args = ap.parse_args()

    import torch

    from hotformerloc_tpu.config.params import parse_model_config
    mp = parse_model_config(args.model_config,
                            octree_depth=args.octree_depth,
                            num_points=args.num_points)
    ckpt = torch.load(args.weights, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    params = convert_state_dict(sd, mp.config)
    validate_against_model(params, mp.config)

    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), {"params": params}, force=True)
    ckptr.wait_until_finished()
    n = sum(v.size for v in _leaves(params))
    print(f"converted {n:,} parameters -> {args.out}")


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
