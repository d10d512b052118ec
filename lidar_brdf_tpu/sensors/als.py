"""Airborne ray generation: linear, zig-zag and elliptical (Palmer) scans.

Differentiable equivalents of the reference's aerial builders
(`AerialLinearBuilder.cpp`, `AerialZigZagBuilder.cpp`,
`AerialEllipticalBuilder.cpp` + GPU kernels
`airborneLinearZigzag-comp.glsl:41-81`, `airborneElliptical-comp.glsl`):
pulses indexed along resampled flight-path waypoints, ray fans perpendicular
to the flight direction (or on a cone around nadir for the Palmer scan),
with height/ray jitter and parallel-ray beam supersampling.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import LiDARType, SensorConfig
from ..core.types import RayBundle
from ..utils import noise as noise_mod
from .paths import auto_sweep_paths, manual_path, retrieve_waypoints
from .tls import radius_axes

AERIAL_UP = jnp.array([0.0, -1.0, 0.0], jnp.float32)


@dataclass
class ALSPlan:
    """Host-side flight plan (waypoints resampled per scan line).

    Mirrors `ALSParameters` built by `AerialLinearBuilder::buildParameters`.
    """

    waypoints: np.ndarray       # (W, 3)
    num_paths: int
    path_length: int            # waypoints per path
    pulses_per_scan: int
    start_radians: float
    increment_radians: float
    # elliptical-only
    ellipse_radius: float = 0.0
    ellipse_scale: float = 0.0
    height_radius: float = 1.0

    @property
    def num_pulses(self) -> int:
        if self.increment_radians and self.pulses_per_scan:
            return (self.path_length - 1) * self.num_paths * self.pulses_per_scan
        return (self.path_length - 1) * self.num_paths


def plan_flight(cfg: SensorConfig, aabb_min, aabb_max,
                rng: np.random.Generator | None = None) -> ALSPlan:
    """Build the flight plan for any aerial mode."""
    aabb_min = np.asarray(aabb_min, np.float64)
    aabb_max = np.asarray(aabb_max, np.float64)
    if cfg.als_manual_path:
        paths = manual_path(cfg.als_manual_path, cfg.als_manual_canvas_size,
                            aabb_min, aabb_max, cfg.als_position[1],
                            cfg.douglas_peucker_epsilon, cfg.use_catmull_rom)
    else:
        paths = auto_sweep_paths(aabb_min, aabb_max, cfg.als_position[1],
                                 cfg.als_fov_horizontal, cfg.als_overlapping,
                                 cfg.als_max_scene_sweeps)
    scene_width = aabb_max[0] - aabb_min[0]
    pulses_per_scan = max(int(cfg.als_pulse_frequency // cfg.als_scan_frequency), 1)

    if cfg.lidar_type == LiDARType.AERIAL_ELLIPTICAL:
        # `AerialEllipticalBuilder::buildParameters` (cpp:32-58)
        num_scans = scene_width / cfg.als_speed * cfg.als_scan_frequency
        num_pulses = scene_width / cfg.als_speed * cfg.als_pulse_frequency
        advance_pulse = 1.0 / max(num_pulses, 1.0)
        waypoints = retrieve_waypoints(paths, advance_pulse, rng)
        path_length = len(waypoints) // len(paths)
        inc = 2.0 * math.pi / max(num_pulses / max(num_scans, 1e-9), 1e-9)
        height_radius = 1.0
        ellipse_radius = math.tan(math.radians(cfg.als_fov_horizontal) / 2.0) \
            * height_radius
        return ALSPlan(
            waypoints=waypoints[:, :3].astype(np.float32),
            num_paths=len(paths), path_length=path_length,
            pulses_per_scan=0, start_radians=0.0, increment_radians=inc,
            ellipse_radius=ellipse_radius,
            ellipse_scale=cfg.als_fov_vertical,
            height_radius=height_radius)

    # linear / zigzag (`AerialLinearBuilder::buildParameters`, cpp:32-65)
    advance_scan = cfg.als_speed / cfg.als_scan_frequency
    advance_scan_t = advance_scan / max(scene_width, 1e-9)
    fov = math.radians(cfg.als_fov_horizontal)
    waypoints = retrieve_waypoints(paths, advance_scan_t, rng)
    path_length = len(waypoints) // len(paths)
    return ALSPlan(
        waypoints=waypoints[:, :3].astype(np.float32),
        num_paths=len(paths), path_length=path_length,
        pulses_per_scan=pulses_per_scan,
        start_radians=-fov / 2.0 + 2.0 * math.pi,
        increment_radians=fov / pulses_per_scan)


def build_als_rays(cfg: SensorConfig, plan: ALSPlan, noise_buf: jax.Array, *,
                   start: int = 0, count: int | None = None) -> RayBundle:
    """Generate aerial pulses [start, start+count).  One jitted dispatch."""
    key = _PlanKey(plan.num_paths, plan.path_length, plan.pulses_per_scan,
                   plan.start_radians, plan.increment_radians,
                   plan.ellipse_radius, plan.ellipse_scale,
                   plan.height_radius)
    waypoints = jnp.asarray(plan.waypoints)
    if cfg.lidar_type == LiDARType.AERIAL_ELLIPTICAL:
        return _build_elliptical(cfg, key, waypoints, noise_buf, start, count)
    zigzag = cfg.lidar_type == LiDARType.AERIAL_ZIGZAG
    return _build_linear_zigzag(cfg, key, waypoints, noise_buf, start, count,
                                zigzag)


def _pulse_disc(cfg, noise_buf, idx, origin, sphere):
    """Shared beam supersampling: ALS offsets both origin and destination by
    the same disc noise (parallel sub-rays — `airborneLinearZigzag-comp.glsl:
    70-79`), unlike the diverging TLS beam."""
    R = cfg.rays_per_pulse
    direction0 = sphere / jnp.maximum(
        jnp.linalg.norm(sphere, axis=-1, keepdims=True), 1e-12)
    u, v = radius_axes(direction0, AERIAL_UP)
    ray_ids = jnp.arange(1, R, dtype=jnp.uint32)
    n1 = noise_mod.sample(noise_buf, idx[:, None],
                          noise_mod.PULSE_NOISE_OFFSET[0] + ray_ids[None, :])
    n2 = noise_mod.sample(noise_buf, idx[:, None],
                          noise_mod.PULSE_NOISE_OFFSET[1] + ray_ids[None, :])
    pr = jnp.float32(cfg.pulse_radius)
    offsets = (n1[..., None] * pr * u[:, None, :]
               + n2[..., None] * pr * v[:, None, :])
    zeros = jnp.zeros_like(origin[:, None, :])
    origin_all = origin[:, None, :] + jnp.concatenate([zeros, offsets], axis=1)
    dir_all = jnp.broadcast_to(direction0[:, None, :], origin_all.shape)
    return origin_all, dir_all


class _PlanKey(NamedTuple):
    """Hashable static subset of ALSPlan for jit keying."""

    num_paths: int
    path_length: int
    pulses_per_scan: int
    start_radians: float
    increment_radians: float
    ellipse_radius: float
    ellipse_scale: float
    height_radius: float


def _plan_pulses(plan: _PlanKey) -> int:
    if plan.increment_radians and plan.pulses_per_scan:
        return (plan.path_length - 1) * plan.num_paths * plan.pulses_per_scan
    return (plan.path_length - 1) * plan.num_paths


@functools.partial(jax.jit, static_argnames=("cfg", "plan", "start", "count",
                                             "zigzag"))
def _build_linear_zigzag(cfg, plan, wp, noise_buf, start, count, zigzag):
    P_total = _plan_pulses(plan)
    if count is None:
        count = P_total - start
    idx = jnp.arange(start, start + count, dtype=jnp.uint32)
    n_pulses = jnp.uint32(plan.pulses_per_scan)
    plen = jnp.uint32(plan.path_length)

    path_id = idx // ((plen - 1) * n_pulses)
    scan_id = idx // n_pulses
    waypoint_id = scan_id % (plen - 1) + 1 + path_id * plen
    pulse_id = (idx % n_pulses).astype(jnp.float32)
    if zigzag:
        sign = (scan_id % 2 == 0).astype(jnp.float32) * 2.0 - 1.0
    else:
        sign = jnp.ones_like(pulse_id)

    w1 = wp[waypoint_id]
    w0 = wp[waypoint_id - 1]
    wdir = w1 - w0
    nd = wdir / jnp.maximum(jnp.linalg.norm(wdir, axis=-1, keepdims=True), 1e-12)
    rot_axis = jnp.stack([-nd[:, 2], jnp.zeros_like(nd[:, 0]), nd[:, 0]], -1)
    angle = sign * jnp.float32(plan.start_radians) \
        + sign * pulse_id * jnp.float32(plan.increment_radians)

    rj = jnp.float32(cfg.als_ray_jittering)
    sphere = rot_axis * (-jnp.sin(angle))[:, None]
    sphere = sphere + jnp.stack(
        [noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[0]) * rj,
         -jnp.cos(angle)
         + noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[1]) * rj,
         noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[2]) * rj],
        axis=-1)
    hj = (noise_mod.sample(noise_buf, idx, noise_mod.HEIGHT_NOISE_OFFSET)
          * jnp.float32(cfg.als_height_jittering))
    sensor = (w1 + jnp.stack([jnp.zeros_like(hj), hj, jnp.zeros_like(hj)], -1)
              + wdir / n_pulses.astype(jnp.float32) * pulse_id[:, None])

    origin_all, dir_all = _pulse_disc(cfg, noise_buf, idx, sensor, sphere)
    gps = idx.astype(jnp.float32) / jnp.float32(cfg.als_pulse_frequency)
    return RayBundle(origin=origin_all, direction=dir_all, gps_time=gps)


@functools.partial(jax.jit, static_argnames=("cfg", "plan", "start", "count"))
def _build_elliptical(cfg, plan, wp, noise_buf, start, count):
    P_total = _plan_pulses(plan)
    if count is None:
        count = P_total - start
    idx = jnp.arange(start, start + count, dtype=jnp.uint32)
    plen = jnp.uint32(plan.path_length)

    path_id = idx // (plen - 1)
    pulse_id = (idx % (plen - 1)).astype(jnp.float32)
    waypoint_id = path_id * plen + (idx % (plen - 1)) + 1

    angle = jnp.float32(plan.increment_radians) * pulse_id
    sphere = jnp.stack([jnp.sin(angle) * jnp.float32(plan.ellipse_scale),
                        jnp.zeros_like(angle),
                        jnp.cos(angle)], -1) * jnp.float32(plan.ellipse_radius)
    rj = jnp.float32(cfg.als_ray_jittering)
    sphere = sphere + jnp.stack(
        [noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[0]) * rj,
         -jnp.float32(plan.height_radius)
         + noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[1]) * rj,
         noise_mod.sample(noise_buf, idx, noise_mod.RAY_NOISE_OFFSET[2]) * rj],
        axis=-1)
    hj = (noise_mod.sample(noise_buf, idx, noise_mod.HEIGHT_NOISE_OFFSET)
          * jnp.float32(cfg.als_height_jittering))
    sensor = wp[waypoint_id] + jnp.stack(
        [jnp.zeros_like(hj), hj, jnp.zeros_like(hj)], -1)

    origin_all, dir_all = _pulse_disc(cfg, noise_buf, idx, sensor, sphere)
    gps = idx.astype(jnp.float32) / jnp.float32(cfg.als_pulse_frequency)
    return RayBundle(origin=origin_all, direction=dir_all, gps_time=gps)
