"""Sensor ray-generation geometry tests (TLS + ALS builders)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig, get_preset,
                                        tls_vertical_angles,
                                        tls_vertical_resolution)
from lidar_brdf_tpu.sensors.als import build_als_rays, plan_flight
from lidar_brdf_tpu.sensors.tls import build_tls_rays, num_tls_pulses
from lidar_brdf_tpu.utils import noise as noise_mod


def _noise():
    return noise_mod.make_raygen_noise(jax.random.PRNGKey(0))


def test_tls_ray_count_and_unit_directions():
    cfg = SensorConfig(tls_resolution_horizontal=10,
                       tls_resolution_vertical=6, rays_per_pulse=4,
                       tls_angle_jittering=0.0)
    rays = build_tls_rays(cfg, _noise())
    assert rays.origin.shape == (60, 4, 3)
    norms = np.linalg.norm(np.asarray(rays.direction), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # TLS: all rays of a pulse share the origin (diverging beam)
    o = np.asarray(rays.origin)
    assert (o == o[:, :1, :]).all()


def test_tls_covers_horizontal_fov():
    cfg = SensorConfig(tls_resolution_horizontal=36,
                       tls_resolution_vertical=1,
                       tls_fov_horizontal=360.0, tls_fov_vertical=15.0,
                       tls_middle_angle_vertical=0.0,
                       rays_per_pulse=1, tls_angle_jittering=0.0)
    rays = build_tls_rays(cfg, _noise())
    d = np.asarray(rays.direction)[:, 0, :]
    az = np.arctan2(-d[:, 2], d[:, 0])
    # azimuths must spread over the full circle
    assert az.max() - az.min() > math.radians(300)


def test_tls_vertical_convention_negative_is_down():
    cfg = SensorConfig(tls_resolution_horizontal=1,
                       tls_resolution_vertical=3,
                       tls_fov_vertical=30.0,
                       tls_middle_angle_vertical=-45.0,
                       rays_per_pulse=1, tls_angle_jittering=0.0)
    rays = build_tls_rays(cfg, _noise())
    d = np.asarray(rays.direction)[:, 0, :]
    assert (d[:, 1] < 0).all()       # all below horizon


def test_tls_nonuniform_bands_pandar():
    cfg = get_preset("pandar64")
    angles = tls_vertical_angles(cfg)
    assert len(angles) == tls_vertical_resolution(cfg) == 63
    # non-uniform: central band much denser than edges
    diffs = np.diff(angles)
    assert diffs.min() < math.radians(0.5)
    assert diffs.max() > math.radians(2.0)


def test_tls_multi_revolution_budget():
    cfg = SensorConfig(tls_resolution_horizontal=8,
                       tls_resolution_vertical=4, rays_per_pulse=1,
                       use_simulation_time=True, simulation_time=1.0,
                       scan_frequency_hz=2.0, tls_angle_jittering=0.0)
    total = num_tls_pulses(cfg)
    rays = build_tls_rays(cfg, _noise(),
                          count=int(total * cfg.scan_frequency_hz))
    assert rays.num_pulses == 2 * total


def test_als_linear_plan_and_rays(rng):
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_LINEAR,
        als_position=(0.0, 50.0, 0.0), als_fov_horizontal=60.0,
        als_speed=10.0, als_scan_frequency=5, als_pulse_frequency=100,
        rays_per_pulse=3, als_ray_jittering=0.0, als_height_jittering=0.0)
    lo = np.array([-40.0, 0.0, -40.0])
    hi = np.array([40.0, 5.0, 40.0])
    plan = plan_flight(cfg, lo, hi, rng)
    assert plan.pulses_per_scan == 20
    assert plan.num_paths >= 1
    rays = build_als_rays(cfg, plan, _noise())
    assert rays.num_pulses == plan.num_pulses
    d = np.asarray(rays.direction)
    # aerial: rays point downward
    assert (d[..., 1] < 0).all()
    # fan angle spread matches the FOV
    ang = np.degrees(np.arctan2(np.linalg.norm(d[..., [0, 2]], axis=-1),
                                -d[..., 1]))
    assert ang.max() <= cfg.als_fov_horizontal / 2 + 1.0
    assert ang.max() >= cfg.als_fov_horizontal / 2 - 5.0
    # ALS beam: sub-rays are parallel within a pulse
    np.testing.assert_allclose(
        d[:, 1:, :], np.broadcast_to(d[:, :1, :], d[:, 1:, :].shape),
        atol=1e-6)


def test_als_zigzag_alternates(rng):
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_ZIGZAG,
        als_position=(0.0, 50.0, 0.0), als_fov_horizontal=40.0,
        als_speed=10.0, als_scan_frequency=5, als_pulse_frequency=50,
        rays_per_pulse=1, als_ray_jittering=0.0, als_height_jittering=0.0)
    lo = np.array([-40.0, 0.0, -40.0])
    hi = np.array([40.0, 5.0, 40.0])
    plan = plan_flight(cfg, lo, hi, rng)
    rays = build_als_rays(cfg, plan, _noise())
    d = np.asarray(rays.direction)[:, 0, :]
    npul = plan.pulses_per_scan
    # within a scan line the across-track component sweeps monotonically;
    # consecutive scan lines sweep in opposite directions
    if rays.num_pulses >= 2 * npul:
        s0 = d[:npul, 2]
        s1 = d[npul:2 * npul, 2]
        assert np.sign(s0[-1] - s0[0]) == -np.sign(s1[-1] - s1[0])


def test_als_elliptical_cone(rng):
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_ELLIPTICAL,
        als_position=(0.0, 50.0, 0.0), als_fov_horizontal=40.0,
        als_elliptical_scale=0.5,
        als_speed=20.0, als_scan_frequency=5, als_pulse_frequency=50,
        rays_per_pulse=1, als_ray_jittering=0.0, als_height_jittering=0.0)
    lo = np.array([-20.0, 0.0, -20.0])
    hi = np.array([20.0, 5.0, 20.0])
    plan = plan_flight(cfg, lo, hi, rng)
    rays = build_als_rays(cfg, plan, _noise())
    d = np.asarray(rays.direction)[:, 0, :]
    assert (d[:, 1] < 0).all()
    # off-nadir angle approximately constant (cone) per scan
    ang = np.degrees(np.arctan2(np.linalg.norm(d[:, [0, 2]], axis=-1),
                                -d[:, 1]))
    assert ang.std() < ang.mean() * 0.6


def test_preset_zenmuse_is_zigzag():
    cfg = get_preset("zenmuse_l1")
    assert cfg.lidar_type == LiDARType.AERIAL_ZIGZAG
    assert cfg.max_returns == 3
