"""Window partition, masks, relative positions, and window statistics.

Static-shape replacement for the reference's `OctreeT` attention plan
(/root/reference/models/octree.py:38-356). Because our node arrays are
per-sample with fixed capacity (a multiple of patch_size * dilation),
"patch partition" is a plain reshape and the batch-id based mask algebra
collapses to node-validity masks — windows can never leak across batch
elements, removing the reference's rt_init_mask / overlap-window special
cases (/root/reference/models/octree.py:124-137) by construction.
"""
from __future__ import annotations

import jax.numpy as jnp

from hotformerloc_tpu.octree import morton

# Additive logit penalty for masked attention slots. The reference uses
# -1e3 (models/octree.py:66); we apply the mask on fp32 logits so a
# larger value is safe and fully suppresses masked keys.
MASK_VALUE = -1e9


def data_to_windows(x: jnp.ndarray, patch_size: int,
                    dilation: int = 1) -> jnp.ndarray:
    """(B, N, ...) -> (B, W, K, ...) with optional dilation.

    Mirrors OctreeT.data_to_windows (models/octree.py:324-339): with
    dilation D, consecutive blocks of K*D nodes are transposed so window
    w holds every D-th node.
    """
    B, N = x.shape[:2]
    K, D = patch_size, dilation
    tail = x.shape[2:]
    if D > 1:
        x = x.reshape(B, N // (K * D), K, D, *tail)
        x = jnp.swapaxes(x, 2, 3)
    return x.reshape(B, N // K, K, *tail)


def windows_to_data(x: jnp.ndarray, patch_size: int,
                    dilation: int = 1) -> jnp.ndarray:
    """Inverse of :func:`data_to_windows`."""
    B, W, K = x.shape[:3]
    tail = x.shape[3:]
    D = dilation
    if D > 1:
        x = x.reshape(B, W // D, D, K, *tail)
        x = jnp.swapaxes(x, 2, 3)
    return x.reshape(B, W * K, *tail)


def window_key_mask(node_valid: jnp.ndarray, patch_size: int,
                    dilation: int = 1) -> jnp.ndarray:
    """Node validity -> per-window key mask (B, W, K) bool."""
    return data_to_windows(node_valid, patch_size, dilation)


def window_valid(node_valid: jnp.ndarray, patch_size: int,
                 dilation: int = 1) -> jnp.ndarray:
    """(B, W) bool: window contains at least one valid node."""
    return jnp.any(window_key_mask(node_valid, patch_size, dilation), axis=-1)


def additive_mask(key_mask: jnp.ndarray) -> jnp.ndarray:
    """Bool key mask -> additive fp32 mask (True -> 0, False -> MASK_VALUE)."""
    return jnp.where(key_mask, 0.0, MASK_VALUE).astype(jnp.float32)


def window_rel_pos(xyz: jnp.ndarray, patch_size: int,
                   dilation: int = 1) -> jnp.ndarray:
    """Pairwise integer coordinate deltas within each window.

    xyz: (B, N, 3) int32 -> (B, W, K, K, 3), rel[i, j] = xyz_i - xyz_j,
    the RPE input (models/octree.py:255-266).
    """
    w = data_to_windows(xyz, patch_size, dilation)  # (B, W, K, 3)
    return w[:, :, :, None, :] - w[:, :, None, :, :]


def window_stats(xyz: jnp.ndarray, node_valid: jnp.ndarray, depth: int,
                 patch_size: int, mode: str = "cov") -> jnp.ndarray:
    """Per-window point-distribution stats for ADaPE.

    Vectorised equivalent of OctreeT.compute_window_stats
    (models/octree.py:268-314), which loops over windows in Python on the
    host. Returns (B, W, C) with C = 3 ('pos'), 6 ('var'), 9 ('cov'):
    mean(x,y,z) then the unbiased (co)variance entries
    [var_x, cov_xy, cov_xz, var_y, cov_yz, var_z] (upper triangle, the
    same order as torch.triu_indices(3, 3)). Windows with < 2 valid
    nodes get zero (co)variance; fully invalid windows are all-zero.
    """
    assert mode in ("pos", "var", "cov")
    pts = morton.grid_to_points(xyz, depth)           # (B, N, 3) in [-1,1]
    pw = data_to_windows(pts, patch_size)             # (B, W, K, 3)
    mw = data_to_windows(node_valid, patch_size).astype(jnp.float32)
    n = jnp.sum(mw, axis=-1)                          # (B, W)
    mean = (jnp.sum(pw * mw[..., None], axis=2)
            / jnp.maximum(n, 1.0)[..., None])
    if mode == "pos":
        return mean
    c = (pw - mean[:, :, None, :]) * mw[..., None]
    # unbiased covariance (divisor n-1), matching torch.Tensor.cov /
    # torch.var defaults used by the reference.
    denom = jnp.maximum(n - 1.0, 1.0)[:, :, None, None]
    cov = jnp.einsum("bwki,bwkj->bwij", c, c) / denom
    cov = jnp.where((n >= 2)[:, :, None, None], cov, 0.0)
    if mode == "var":
        tri = jnp.stack([cov[..., 0, 0], cov[..., 1, 1], cov[..., 2, 2]], -1)
    else:
        tri = jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], -1)
    return jnp.concatenate([mean, tri], axis=-1)


def masked_window_mean(x: jnp.ndarray, node_valid: jnp.ndarray,
                       patch_size: int) -> jnp.ndarray:
    """Mean of valid node features per window: the relay-token init.

    Equivalent of RelayTokenInitialiser's masked nanmean
    (models/hotformerloc_backbone.py:316-334); empty windows -> 0.
    """
    xw = data_to_windows(x, patch_size)
    mw = data_to_windows(node_valid, patch_size).astype(x.dtype)
    s = jnp.einsum("bwkc,bwk->bwc", xw, mw)
    n = jnp.maximum(jnp.sum(mw, axis=-1), 1.0)
    return s / n[..., None]
