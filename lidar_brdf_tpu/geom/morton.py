"""30-bit Morton codes for BVH construction.

Math parity with the reference kernel
`Assets/Shaders/Compute/BVHGeneration/computeMortonCodes-comp.glsl:17-55`
(expand 10 bits per axis, interleave x:y:z as 4x+2y+z over normalized scene
coordinates).  Provided both as numpy (host BVH build) and jax (device-side
build / tests).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MASKS = (0xFF0000FF, 0x0F00F00F, 0xC30C30C3, 0x49249249)
_MULTS = (0x00010001, 0x00000101, 0x00000011, 0x00000005)


def expand_bits_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    for mult, mask in zip(_MULTS, _MASKS):
        v = (v * mult) & mask
    return v.astype(np.uint32)


def morton3d_np(points: np.ndarray, scene_min: np.ndarray,
                scene_max: np.ndarray) -> np.ndarray:
    """Morton code of points normalized to the scene AABB (numpy, uint32)."""
    extent = np.maximum(scene_max - scene_min, 1e-12)
    norm = (points - scene_min) / extent
    q = np.clip((norm * 1024.0).astype(np.uint32), 0, 1023)
    xx = expand_bits_np(q[..., 0]).astype(np.uint64)
    yy = expand_bits_np(q[..., 1]).astype(np.uint64)
    zz = expand_bits_np(q[..., 2]).astype(np.uint64)
    return (xx * 4 + yy * 2 + zz).astype(np.uint32)


def expand_bits_jnp(v):
    v = v.astype(jnp.uint32)
    for mult, mask in zip(_MULTS, _MASKS):
        v = (v * jnp.uint32(mult)) & jnp.uint32(mask)
    return v


def morton3d_jnp(points, scene_min, scene_max):
    """Morton code of points normalized to the scene AABB (jax, uint32)."""
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    norm = (points - scene_min) / extent
    q = jnp.clip((norm * 1024.0).astype(jnp.int32), 0, 1023).astype(jnp.uint32)
    xx = expand_bits_jnp(q[..., 0])
    yy = expand_bits_jnp(q[..., 1])
    zz = expand_bits_jnp(q[..., 2])
    return xx * 4 + yy * 2 + zz
