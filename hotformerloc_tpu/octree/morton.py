"""Morton (z-order) key encoding/decoding in pure JAX int32 ops.

The reference framework inherits z-order node ordering from the external
`ocnn` package (`ocnn.octree.key2xyz`, used at
/root/reference/models/octree.py:258). Here we own the key machinery:
keys are 3*depth-bit Morton codes with the x bit most significant within
each bit-triple (matching ocnn's ``x<<2 | y<<1 | z`` convention), stored
as int32 (valid for depth <= 10, i.e. 30 bits).

All functions are shape-polymorphic elementwise ops, usable under jit/vmap
on TPU or CPU.
"""
from __future__ import annotations

import jax.numpy as jnp

# Any value >= 2**30 is safely larger than every valid Morton key
# (max 30 bits) and is used to mark invalid / padding nodes so they sort
# to the tail of per-sample key arrays.
# Plain Python int (not jnp.int32): creating a device scalar at import
# time would initialize the jax backend and lock the platform choice
# before callers can configure virtual CPU meshes.
SENTINEL = 2**30

_MAX_DEPTH = 10


def part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of ``x`` so bit i moves to bit 3*i."""
    x = x.astype(jnp.int32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`part1by2`: collect every third bit."""
    x = x.astype(jnp.int32) & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x000003FF
    return x


def encode(xyz: jnp.ndarray) -> jnp.ndarray:
    """Interleave integer coords (..., 3) -> Morton keys (...,).

    Bit layout per level (most significant first): x, y, z — the same
    per-triple ordering as ocnn's xyz2key, so z-order traversal
    (and therefore attention-window composition) matches the reference's.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return (part1by2(x) << 2) | (part1by2(y) << 1) | part1by2(z)


def decode(key: jnp.ndarray) -> jnp.ndarray:
    """Morton keys (...,) -> integer coords (..., 3)."""
    x = compact1by2(key >> 2)
    y = compact1by2(key >> 1)
    z = compact1by2(key)
    return jnp.stack([x, y, z], axis=-1)


def points_to_grid(points: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Quantize points in [-1, 1]^3 to integer voxel coords at ``depth``.

    Mirrors ocnn's octree build quantization: coordinate u = floor((p+1) *
    2^(depth-1)) clamped into [0, 2^depth - 1].
    """
    assert depth <= _MAX_DEPTH, f"depth {depth} exceeds int32 Morton range"
    scale = jnp.float32(2 ** (depth - 1))
    u = jnp.floor((points.astype(jnp.float32) + 1.0) * scale)
    return jnp.clip(u, 0, 2**depth - 1).astype(jnp.int32)


def grid_to_points(xyz: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Rescale integer voxel coords at ``depth`` back into [-1, 1].

    Equivalent of the reference's ``rescale_octree_points``
    (/root/reference/misc/utils.py:293-304): p = u * 2^(1-d) - 1.
    """
    scale = jnp.float32(2.0 ** (1 - depth))
    return xyz.astype(jnp.float32) * scale - 1.0
