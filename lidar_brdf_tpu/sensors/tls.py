"""Terrestrial spherical ray generation (TLS).

Pure-functional, differentiable equivalent of the reference's TLS ray
builder (`TerrestrialSphericalBuilder.cpp` + GPU kernel
`terrestrialSpherical-comp.glsl:44-85`): one pulse per (horizontal,
vertical) grid cell, direction from spherical sweep with per-row vertical
angles (uniform or banded), optional angle jitter around a random axis, and
beam-footprint supersampling on a disc of ``pulse_radius``.

Conventions: the reference's GPU `rotation3d` helper builds the *transpose*
of the standard Rodrigues matrix (a negative-angle rotation), under which a
negative vertical angle points below the horizon — the usual LiDAR spec
convention (e.g. HDL-64E middle angle -11.45 deg looks down), and the
convention the sensor presets assume.  We follow the GPU kernel (the CPU
path via `glm::rotate` disagrees in sign with its own GPU path).

Differentiable w.r.t. the sensor ``position`` argument (pass a traced array
for pose gradients).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import SensorConfig, tls_vertical_angles, tls_vertical_resolution
from ..core.types import RayBundle
from ..utils import noise as noise_mod

UP = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def rotate_axis_angle(v, axis, angle):
    """Rodrigues rotation of v around unit axis by angle (radians)."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    d = jnp.sum(axis * v, axis=-1, keepdims=True)
    return v * c + jnp.cross(axis, v) * s + axis * d * (1.0 - c)


def radius_axes(direction, up):
    """Footprint disc basis (`Templates/computeAxes.glsl`)."""
    u = jnp.cross(jnp.broadcast_to(up, direction.shape), direction)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = jnp.cross(direction, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return u, v


def num_tls_pulses(cfg: SensorConfig) -> int:
    return cfg.tls_resolution_horizontal * tls_vertical_resolution(cfg)


def build_tls_rays(cfg: SensorConfig, noise_buf: jax.Array, *,
                   position=None, direction=None,
                   start: int = 0, count: int | None = None) -> RayBundle:
    """Generate TLS pulses [start, start+count) of the scan grid.

    ``noise_buf`` is the U[-1,1] ray-gen buffer (`RayBuilder.cpp:55-66`).
    Jitted per (cfg, start, count) signature — one device dispatch.
    """
    return _build_tls_rays_jit(cfg, noise_buf, position, direction,
                               start, count)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "start", "count"))
def _build_tls_rays_jit(cfg, noise_buf, position, direction, start, count):
    vres = tls_vertical_resolution(cfg)
    total = num_tls_pulses(cfg)
    if count is None:
        count = total - start
    R = cfg.rays_per_pulse

    vtable = jnp.asarray(np.asarray(tls_vertical_angles(cfg), np.float32))
    fov_h = jnp.float32(np.radians(cfg.tls_fov_horizontal))
    inc_h = fov_h / jnp.float32(total)
    start_rad = jnp.float32(np.radians(cfg.tls_middle_angle_horizontal))
    if position is None:
        position = jnp.asarray(cfg.tls_position, jnp.float32)
    if direction is None:
        direction = jnp.asarray(cfg.tls_direction, jnp.float32)
    advance = direction / jnp.array([total, 1.0, total], jnp.float32)
    time_pulse = jnp.float32((1.0 / cfg.scan_frequency_hz) / total)

    idx = jnp.arange(start, start + count, dtype=jnp.uint32)
    h_id = idx // jnp.uint32(vres)
    v_id = idx % jnp.uint32(vres)
    v_angle = vtable[v_id]
    h_angle = (-fov_h / 2.0 + start_rad
               + inc_h * (h_id * jnp.uint32(vres)).astype(jnp.float32)
               + inc_h * v_id.astype(jnp.float32))
    sphere = jnp.stack([jnp.cos(h_angle),
                        jnp.zeros_like(h_angle),
                        -jnp.sin(h_angle)], axis=-1)
    rot_axis = jnp.stack([sphere[:, 2], jnp.zeros_like(h_angle),
                          -sphere[:, 0]], axis=-1)
    # negative angle = below horizon (GPU `rotation3d` transpose convention)
    dest = rotate_axis_angle(sphere, rot_axis, -v_angle)

    if cfg.tls_angle_jittering > 0:
        jitter_axis = jnp.stack(
            [noise_mod.sample(noise_buf, idx, noise_mod.AXIS_NOISE_OFFSET[0]),
             noise_mod.sample(noise_buf, idx, noise_mod.AXIS_NOISE_OFFSET[1]),
             noise_mod.sample(noise_buf, idx, noise_mod.AXIS_NOISE_OFFSET[2])],
            axis=-1)
        jitter_angle = (noise_mod.sample(noise_buf, idx,
                                         noise_mod.ANGLE_NOISE_OFFSET)
                        * jnp.float32(cfg.tls_angle_jittering))
        dest = rotate_axis_angle(dest, jitter_axis, jitter_angle)

    origin = position[None, :] + advance[None, :] * idx.astype(jnp.float32)[:, None]
    gps_time = time_pulse * idx.astype(jnp.float32)

    # Beam supersampling: central ray + (R-1) destinations jittered on the
    # footprint disc; TLS rays share the origin (diverging beam).
    u, v = radius_axes(dest, UP)
    ray_ids = jnp.arange(1, R, dtype=jnp.uint32)
    n1 = noise_mod.sample(noise_buf, idx[:, None],
                          noise_mod.PULSE_NOISE_OFFSET[0] + ray_ids[None, :])
    n2 = noise_mod.sample(noise_buf, idx[:, None],
                          noise_mod.PULSE_NOISE_OFFSET[1] + ray_ids[None, :])
    pr = jnp.float32(cfg.pulse_radius)
    offsets = (n1[..., None] * pr * u[:, None, :]
               + n2[..., None] * pr * v[:, None, :])          # (P, R-1, 3)
    dest_all = jnp.concatenate([dest[:, None, :],
                                dest[:, None, :] + offsets], axis=1)
    origin_all = jnp.broadcast_to(origin[:, None, :], dest_all.shape)
    dirs = dest_all / jnp.maximum(
        jnp.linalg.norm(dest_all, axis=-1, keepdims=True), 1e-12)
    return RayBundle(origin=origin_all, direction=dirs, gps_time=gps_time)
