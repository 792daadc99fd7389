"""Torch-side octree harness for running the REFERENCE model end to end.

Purpose: numerical-parity evidence. The reference model
(/root/reference/models/model_factory.py:25-76) depends on the external
`ocnn` package and the CUDA `dwconv` extension, neither of which is
installable in this offline environment. This module provides a minimal
CPU implementation of the exact API slice the reference consumes
(SURVEY.md section L0'), installs it as fake ``ocnn`` / ``dwconv``
modules, and imports the *actual reference source* from
``/root/reference`` so its real ``state_dict()`` and descriptors can be
compared against this framework's converted model.

Scope & caveat (stated per the round-1 review): this harness is an
independent third implementation of the octree engine (numpy/torch here,
vs the JAX engine in ``hotformerloc_tpu/octree/``, vs upstream ocnn which
we cannot install). A parity test built on it verifies the full model
stack -- layer wiring, attention math, masking, pooling, and the weight
converter's key mapping / transposes / tap order -- but shares the
octree *semantics* assumptions (Morton bit layout ``x<<2|y<<1|z``,
z-raster 3x3x3 tap order, octant order ``4x+2y+z``) with the JAX engine.
Those assumptions are themselves golden-tested in
tests/test_octree_core.py against hand-derived values.

Everything here is new code; no reference source is copied. API shapes
follow the call sites cited inline.
"""
from __future__ import annotations

import sys
import types
from typing import Dict, List, Sequence

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"

# Batch index lives in the high bits of a node key, above the 3*16-bit
# Morton payload (ocnn convention, decoded by key2xyz at
# /root/reference/models/octree.py:258).
_BKEY_SHIFT = 48
_KEY_MASK = (1 << _BKEY_SHIFT) - 1


# --------------------------------------------------------------------------
# int64 Morton codec (numpy). Same bit layout as hotformerloc_tpu.octree.
# morton: per level the triple is (x, y, z) most- to least-significant.
# --------------------------------------------------------------------------
def _part1by2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64) & 0x3FF          # depth <= 10
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact1by2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64) & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x000003FF
    return x


def morton_encode(xyz: np.ndarray) -> np.ndarray:
    return ((_part1by2(xyz[..., 0]) << 2) | (_part1by2(xyz[..., 1]) << 1)
            | _part1by2(xyz[..., 2]))


def morton_decode(key: np.ndarray):
    k = key & _KEY_MASK
    return _compact1by2(k >> 2), _compact1by2(k >> 1), _compact1by2(k)


def _kernel_offsets(kernel: str) -> np.ndarray:
    """(K, 3) displacement taps in z-fastest raster order (matches
    hotformerloc_tpu.octree.neigh.kernel_offsets)."""
    sizes = [int(c) for c in kernel]
    assert len(sizes) == 3 and all(s % 2 == 1 for s in sizes), kernel
    ranges = [np.arange(-(s // 2), s // 2 + 1) for s in sizes]
    grid = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int64)


# --------------------------------------------------------------------------
# Shim Octree
# --------------------------------------------------------------------------
class Points:
    """Minimal stand-in for ocnn.octree.Points: holds (N, 3) in [-1,1]."""

    def __init__(self, points: torch.Tensor, normals=None):
        self.points = torch.as_tensor(points, dtype=torch.float32)
        self.normals = normals


class Octree:
    """CPU octree with the attribute surface the reference model uses.

    Non-empty nodes only (the model runs with ``nempty=True`` throughout,
    /root/reference/models/hotformerloc.py:29). Per depth, node keys are
    stored sorted ascending with the batch id in bits >= 48, exactly the
    merged layout `ocnn.octree.merge_octrees` produces (consumed at
    /root/reference/datasets/dataset_utils.py:94).
    """

    def __init__(self, depth: int, full_depth: int = 2, batch_size: int = 1,
                 device="cpu"):
        self.depth = depth
        self.full_depth = full_depth
        self.batch_size = batch_size
        self.device = torch.device(device)
        nd = depth + 1
        self.nnum = torch.zeros(nd, dtype=torch.long)
        self.nnum_nempty = torch.zeros(nd, dtype=torch.long)
        self.batch_nnum = torch.zeros(nd, batch_size, dtype=torch.long)
        self.batch_nnum_nempty = torch.zeros(nd, batch_size, dtype=torch.long)
        # per depth: int64 numpy keys (batch bits | morton), sorted asc.
        self._keys: List = [None] * nd
        self._starts: List = [None] * nd        # (B+1,) offsets per depth
        self._leaf_mean = None                  # (N_leaf, 3) in [-1, 1]
        self._neigh_cache: Dict = {}

    # -- construction ------------------------------------------------------
    def build_octree(self, point_cloud: Points):
        pts = np.asarray(point_cloud.points, np.float32)
        d = self.depth
        grid = np.clip(np.floor((pts + 1.0) * 2 ** (d - 1)),
                       0, 2 ** d - 1).astype(np.int64)
        keys = morton_encode(grid)
        order = np.argsort(keys, kind="stable")
        skeys, spts = keys[order], pts[order]
        ukeys, inv, counts = np.unique(skeys, return_inverse=True,
                                       return_counts=True)
        sums = np.zeros((len(ukeys), 3), np.float64)
        np.add.at(sums, inv, spts)
        self._leaf_mean = (sums / counts[:, None]).astype(np.float32)
        self._set_level(d, ukeys)
        for dd in range(d - 1, self.full_depth - 1, -1):
            self._set_level(dd, np.unique(self._keys[dd + 1] >> 3))

    def _set_level(self, d: int, keys: np.ndarray):
        self._keys[d] = keys
        n = len(keys)
        self.nnum[d] = n
        self.nnum_nempty[d] = n
        b = (keys >> _BKEY_SHIFT).astype(np.int64)
        cnt = np.bincount(b, minlength=self.batch_size)
        self.batch_nnum[d] = torch.from_numpy(cnt)
        self.batch_nnum_nempty[d] = torch.from_numpy(cnt)
        self._starts[d] = np.concatenate([[0], np.cumsum(cnt)])

    def construct_all_neigh(self):             # parity with ocnn API
        pass                                   # tables built lazily

    # -- accessors (signatures per /root/reference/models/octree.py) -------
    def key(self, depth: int, nempty: bool = True) -> torch.Tensor:
        assert nempty, "shim stores non-empty nodes only"
        return torch.from_numpy(self._keys[depth])

    def batch_id(self, depth: int, nempty: bool = True) -> torch.Tensor:
        assert nempty
        return torch.from_numpy(self._keys[depth] >> _BKEY_SHIFT)

    def xyzb(self, depth: int, nempty: bool = True):
        assert nempty
        k = self._keys[depth]
        x, y, z = morton_decode(k)
        return (torch.from_numpy(x), torch.from_numpy(y),
                torch.from_numpy(z), torch.from_numpy(k >> _BKEY_SHIFT))

    # -- gather tables ------------------------------------------------------
    def _lookup(self, depth: int, query: np.ndarray,
                valid: np.ndarray) -> np.ndarray:
        """Find query keys (with batch bits) among depth's sorted keys.
        Returns global int64 indices, -1 where absent/invalid."""
        keys = self._keys[depth]
        pos = np.searchsorted(keys, query)
        pos = np.minimum(pos, len(keys) - 1) if len(keys) else pos * 0
        hit = valid & (len(keys) > 0)
        if len(keys):
            hit = hit & (keys[pos] == query)
        return np.where(hit, pos, -1).astype(np.int64)

    def get_neigh(self, depth: int, kernel: str = "333", stride: int = 1,
                  nempty: bool = True) -> torch.Tensor:
        """(N, K) neighbour gather table for stride-1 convs (used by the
        CUDA dwconv wrapper at /root/reference/libs/dwconv/dwconv/nn.py:59)."""
        assert stride == 1 and nempty
        ck = (depth, kernel)
        if ck in self._neigh_cache:
            return self._neigh_cache[ck]
        offs = _kernel_offsets(kernel)                    # (K, 3)
        keys = self._keys[depth]
        b = keys >> _BKEY_SHIFT
        x, y, z = morton_decode(keys)
        lim = 2 ** depth
        cx = x[:, None] + offs[None, :, 0]
        cy = y[:, None] + offs[None, :, 1]
        cz = z[:, None] + offs[None, :, 2]
        inside = ((cx >= 0) & (cx < lim) & (cy >= 0) & (cy < lim)
                  & (cz >= 0) & (cz < lim))
        q = (b[:, None] << _BKEY_SHIFT) | morton_encode(
            np.stack([np.maximum(cx, 0), np.maximum(cy, 0),
                      np.maximum(cz, 0)], axis=-1))
        tab = torch.from_numpy(self._lookup(depth, q, inside))
        self._neigh_cache[ck] = tab
        return tab

    def children(self, depth: int) -> torch.Tensor:
        """(N_{depth-1}, 8) global indices of each parent's children at
        ``depth`` in octant order 4x+2y+z; -1 = empty child. Backs the
        kernel-[2] stride-2 convs (octformer_backbone.py:433-435,462-464)."""
        ck = ("children", depth)
        if ck in self._neigh_cache:
            return self._neigh_cache[ck]
        pk = self._keys[depth - 1]
        # child key = b<<48 | (morton<<3 | octant); shifting the full key
        # would push the batch bits out of range, so recompose explicitly.
        bq = (pk >> _BKEY_SHIFT)[:, None]
        mq = (((pk & _KEY_MASK)[:, None] << 3)
              | np.arange(8, dtype=np.int64)[None, :])
        q = (bq << _BKEY_SHIFT) | mq
        tab = torch.from_numpy(
            self._lookup(depth, q, np.ones_like(q, bool)))
        self._neigh_cache[ck] = tab
        return tab

    def parent_of(self, depth: int) -> torch.Tensor:
        """(N_depth,) global index of each node's parent at depth-1."""
        k = self._keys[depth]
        q = ((k >> _BKEY_SHIFT) << _BKEY_SHIFT) | ((k & _KEY_MASK) >> 3)
        return torch.from_numpy(self._lookup(depth - 1, q,
                                             np.ones_like(q, bool)))

    def to(self, device, non_blocking: bool = False):
        assert torch.device(device) == self.device, "shim is CPU-only"
        return self


def merge_octrees(octrees: Sequence[Octree]) -> Octree:
    """Batch-merge per-sample octrees: concatenate each depth's node arrays
    in batch order with the batch id placed in the key's high bits
    (semantics of ocnn.octree.merge_octrees, consumed at
    /root/reference/datasets/dataset_utils.py:94)."""
    depth, full = octrees[0].depth, octrees[0].full_depth
    out = Octree(depth, full, batch_size=len(octrees))
    for d in range(full, depth + 1):
        keys = np.concatenate([
            (np.int64(i) << _BKEY_SHIFT) | o._keys[d]
            for i, o in enumerate(octrees)])
        out._set_level(d, keys)
    out._leaf_mean = np.concatenate([o._leaf_mean for o in octrees])
    return out


def key2xyz(key: torch.Tensor, depth: int = 16):
    """ocnn.octree.key2xyz (consumed at models/octree.py:258)."""
    k = key.numpy().astype(np.int64)
    x, y, z = morton_decode(k)
    return (torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(z),
            torch.from_numpy(k >> _BKEY_SHIFT))


# --------------------------------------------------------------------------
# Shim NN ops (torch, CPU)
# --------------------------------------------------------------------------
def _gather_rows(data: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """(N, C) rows gathered by (M, K) global indices; -1 -> zeros."""
    safe = idx.clamp_min(0)
    out = data[safe.reshape(-1)].reshape(*idx.shape, data.shape[-1])
    return out * (idx >= 0).unsqueeze(-1)


def _kernel_str(kernel_size: List[int]) -> str:
    ks = list(kernel_size) * (3 if len(kernel_size) == 1 else 1)
    return "".join(str(k) for k in ks)


class OctreeConv(torch.nn.Module):
    """~ ocnn.nn.OctreeConv as used by OctreeConvNormRelu / Downsample
    (octformer_layers.py:80-99, octformer_backbone.py:456-469). Weights
    kept in ocnn's flattened (K*Cin, Cout) layout so state_dict keys and
    shapes match what the converter expects."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: List[int] = [3], stride: int = 1,
                 nempty: bool = False, use_bias: bool = False):
        super().__init__()
        self.kernel = _kernel_str(kernel_size)
        self.stride = stride
        self.nempty = nempty
        self.use_bias = use_bias
        self.in_channels = in_channels
        self.out_channels = out_channels
        kdim = int(np.prod([int(c) for c in self.kernel]))
        self.kdim = kdim
        self.weights = torch.nn.Parameter(
            torch.randn(kdim * in_channels, out_channels) * 0.02)
        if use_bias:
            self.bias = torch.nn.Parameter(torch.zeros(out_channels))

    def forward(self, data: torch.Tensor, octree: Octree, depth: int):
        if self.stride == 1:
            idx = octree.get_neigh(depth, self.kernel, 1, self.nempty)
        else:
            assert self.stride == 2 and self.kernel == "222"
            idx = octree.children(depth)          # output at depth-1
        patch = _gather_rows(data, idx)           # (M, K, Cin)
        out = patch.reshape(patch.shape[0], -1) @ self.weights
        if self.use_bias:
            out = out + self.bias
        return out


class OctreeDeconv(torch.nn.Module):
    """~ ocnn.nn.OctreeDeconv (kernel [2] stride 2 upsample), consumed by
    OctreeDeconvNormRelu (octformer_layers.py:101-119; not in shipped
    configs). out[child] = W[octant]^T x[parent]."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: List[int] = [2], stride: int = 2,
                 nempty: bool = False, use_bias: bool = False):
        super().__init__()
        assert stride == 2
        self.nempty = nempty
        self.use_bias = use_bias
        self.weights = torch.nn.Parameter(
            torch.randn(8 * in_channels, out_channels) * 0.02)
        if use_bias:
            self.bias = torch.nn.Parameter(torch.zeros(out_channels))
        self.in_channels = in_channels
        self.out_channels = out_channels

    def forward(self, data: torch.Tensor, octree: Octree, depth: int):
        parent = octree.parent_of(depth + 1)
        octant = torch.from_numpy(
            (octree._keys[depth + 1] & 7).astype(np.int64))
        xp = _gather_rows(data, parent.unsqueeze(-1)).squeeze(-2)
        w = self.weights.reshape(8, self.in_channels, self.out_channels)
        out = torch.einsum("nc,nco->no", xp, w[octant])
        if self.use_bias:
            out = out + self.bias
        return out


class OctreeDWConv(torch.nn.Module):
    """~ the dwconv CUDA module (libs/dwconv/dwconv/nn.py:49-63):
    out[h, c] = sum_k w[k, 0, c] * data[neigh[h, k], c]."""

    def __init__(self, channels: int, kernel_size: List[int] = [3],
                 nempty: bool = False, use_bias: bool = False, **kw):
        super().__init__()
        self.kernel = _kernel_str(kernel_size)
        self.nempty = nempty
        self.use_bias = use_bias
        kdim = int(np.prod([int(c) for c in self.kernel]))
        self.weights = torch.nn.Parameter(
            torch.randn(kdim, 1, channels) * 0.02)
        if use_bias:
            self.bias = torch.nn.Parameter(torch.zeros(channels))

    def forward(self, data: torch.Tensor, octree: Octree, depth: int):
        idx = octree.get_neigh(depth, self.kernel, 1, self.nempty)
        patch = _gather_rows(data, idx)            # (N, K, C)
        out = torch.einsum("nkc,kc->nc", patch, self.weights.squeeze(1))
        if self.use_bias:
            out = out + self.bias
        return out


class OctreeGlobalPool(torch.nn.Module):
    """~ ocnn.nn.OctreeGlobalPool (per-batch mean, pooling.py:29,76)."""

    def __init__(self, nempty: bool = False):
        super().__init__()
        self.nempty = nempty

    def forward(self, data: torch.Tensor, octree: Octree, depth: int):
        b = octree.batch_id(depth, self.nempty)
        B = octree.batch_size
        out = torch.zeros(B, data.shape[-1], dtype=data.dtype)
        out.index_add_(0, b, data)
        cnt = torch.zeros(B, dtype=data.dtype).index_add_(
            0, b, torch.ones(len(b), dtype=data.dtype))
        return out / cnt.clamp_min(1).unsqueeze(-1)


class InputFeature(torch.nn.Module):
    """~ ocnn.modules.InputFeature (models/hotformerloc.py:28-31).
    'P': mean point position per leaf octant in the global [-1,1] frame;
    'D': displacement norm is NOT used by the reference ('D' is the 3-ch
    local displacement there is 1-ch in model_factory.py:11 -- here we
    mirror model_factory's channel table: L=3, P=3, D=1, N=3)."""

    def __init__(self, feature: str = "P", nempty: bool = True):
        super().__init__()
        assert nempty
        self.feature = feature.upper()

    def forward(self, octree: Octree) -> torch.Tensor:
        d = octree.depth
        mean = torch.from_numpy(octree._leaf_mean)
        feats = []
        if "P" in self.feature:
            feats.append(mean)
        if "L" in self.feature or "D" in self.feature:
            x, y, z, _ = octree.xyzb(d)
            centre = (torch.stack([x, y, z], dim=1).float() + 0.5) \
                * 2.0 ** (1 - d) - 1.0
            disp = (mean - centre) * 2.0 ** (d - 1)    # voxel units
            if "L" in self.feature:
                feats.append(disp)
            if "D" in self.feature:
                feats.append(disp.norm(dim=-1, keepdim=True))
        if "N" in self.feature:
            raise NotImplementedError("normals not carried by the shim")
        return torch.cat(feats, dim=-1)


# --------------------------------------------------------------------------
# Module installation + reference import
# --------------------------------------------------------------------------
def install_shim():
    """Register fake ``ocnn``/``dwconv`` packages in sys.modules."""
    if "ocnn" in sys.modules and getattr(sys.modules["ocnn"], "_is_shim",
                                         False):
        return
    ocnn = types.ModuleType("ocnn")
    ocnn._is_shim = True
    oct_m = types.ModuleType("ocnn.octree")
    oct_m.Octree, oct_m.Points = Octree, Points
    oct_m.merge_octrees, oct_m.key2xyz = merge_octrees, key2xyz
    nn_m = types.ModuleType("ocnn.nn")
    nn_m.OctreeConv, nn_m.OctreeDeconv = OctreeConv, OctreeDeconv
    nn_m.OctreeDWConv, nn_m.OctreeGlobalPool = OctreeDWConv, OctreeGlobalPool
    mod_m = types.ModuleType("ocnn.modules")
    mod_m.InputFeature = InputFeature
    ocnn.octree, ocnn.nn, ocnn.modules = oct_m, nn_m, mod_m
    dw = types.ModuleType("dwconv")
    dw.OctreeDWConv = OctreeDWConv
    sys.modules.update({"ocnn": ocnn, "ocnn.octree": oct_m,
                        "ocnn.nn": nn_m, "ocnn.modules": mod_m,
                        "dwconv": dw})


def load_reference_model(model_config_path: str):
    """Instantiate the real reference model (model_factory.py:25-76) with
    the shim engine; returns (torch model, reference ModelParams)."""
    install_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # The reference's top-level dirs have no __init__.py (namespace
    # packages), so an installed regular package of the same name (e.g.
    # huggingface `datasets`) would shadow them. Pin synthetic packages
    # whose search path is the reference tree.
    for pkg in ("datasets", "misc", "models"):
        existing = sys.modules.get(pkg)
        path = f"{REFERENCE_ROOT}/{pkg}"
        if existing is None or path not in getattr(existing, "__path__", []):
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m
    from misc.utils import ModelParams          # reference code
    from models.model_factory import model_factory
    mp = ModelParams(model_config_path)
    model = model_factory(mp)
    model.eval()
    return model, mp


def build_batch(clouds: Sequence[np.ndarray], depth: int,
                full_depth: int = 2) -> Dict:
    """clouds: list of (P, 3) arrays in [-1,1] -> reference batch dict."""
    octrees = []
    for c in clouds:
        o = Octree(depth, full_depth)
        o.build_octree(Points(torch.from_numpy(np.asarray(c, np.float32))))
        octrees.append(o)
    return {"octree": merge_octrees(octrees)}


@torch.no_grad()
def reference_descriptors(model, clouds: Sequence[np.ndarray], depth: int,
                          full_depth: int = 2,
                          batch_size: int = 1) -> np.ndarray:
    """Descriptors from the reference model. Default batch_size=1: the
    reference's window partition packs the batch into one ragged node
    list, so its descriptors are batch-packing-dependent; B=1 is the
    canonical per-cloud value our per-sample layout reproduces."""
    outs = []
    for i in range(0, len(clouds), batch_size):
        batch = build_batch(clouds[i:i + batch_size], depth, full_depth)
        outs.append(model(batch)["global"].float().numpy())
    return np.concatenate(outs)
