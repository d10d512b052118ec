"""Finite-difference gradient checks (BASELINE config 2)."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_brdf_tpu.api import build_rays, build_scene_bvh
from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig, ShadingMode)
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.physics.returns import SimScalars
from lidar_brdf_tpu.runtime.simulate import simulate_chunk
from lidar_brdf_tpu.utils import noise as noise_mod


def _setup(shading, rng, rays_per_pulse=1):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=3)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 10.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=70.0,
        tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=16, tls_resolution_vertical=8,
        rays_per_pulse=rays_per_pulse, max_returns=1, chunk_pulses=128,
        shading_mode=shading, include_shiny_surface_error=False)
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    return scene, bvh, cfg, rays, materials, scalars, noise


def _fd_check(f, x0, eps, n_probes, rng, rtol=0.05, atol=1e-7):
    """Compare AD gradient against central finite differences along random
    coordinate probes."""
    g = jax.grad(f)(x0)
    g = np.asarray(g)
    x0 = np.asarray(x0)
    flat_g = g.ravel()
    # probe the largest-gradient coordinates (informative directions)
    order = np.argsort(-np.abs(flat_g))
    checked = 0
    for idx in order[:n_probes]:
        e = np.zeros_like(x0).ravel()
        e[idx] = eps
        e = e.reshape(x0.shape)
        fp = float(f(jnp.asarray(x0 + e)))
        fm = float(f(jnp.asarray(x0 - e)))
        fd = (fp - fm) / (2 * eps)
        ad = flat_g[idx]
        assert abs(fd - ad) <= rtol * max(abs(fd), abs(ad)) + atol, \
            f"coord {idx}: fd={fd} ad={ad}"
        checked += 1
    assert checked > 0


def test_intensity_grad_wrt_brdf_table_matches_fd(rng):
    scene, bvh, cfg, rays, materials, scalars, noise = _setup(
        ShadingMode.MEASURED, rng)

    def f(table):
        mats = materials.__class__(**{**materials.__dict__,
                                      "brdf_table": table})
        cloud = simulate_chunk(scene, bvh, mats, rays, noise, scalars, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    _fd_check(f, jnp.asarray(materials.brdf_table), eps=1e-3,
              n_probes=5, rng=rng)


def test_intensity_grad_wrt_scalars_matches_fd(rng):
    scene, bvh, cfg, rays, materials, scalars, noise = _setup(
        ShadingMode.MEASURED, rng)

    def f_power(p):
        sc = scalars.__class__(**{**scalars.__dict__, "peak_power": p})
        cloud = simulate_chunk(scene, bvh, materials, rays, noise, sc, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    p0 = jnp.float32(65.0)
    ad = float(jax.grad(f_power)(p0))
    eps = 0.1
    fd = (float(f_power(p0 + eps)) - float(f_power(p0 - eps))) / (2 * eps)
    assert abs(fd - ad) <= 0.02 * max(abs(fd), abs(ad)) + 1e-9


def test_position_gradients_wrt_sensor_pose(rng):
    """Point positions and ranges must carry gradients w.r.t. the TLS sensor
    position through ray generation + intersection refinement."""
    scene, bvh, cfg, rays, materials, scalars, noise = _setup(
        ShadingMode.LAMBERTIAN, rng)
    from lidar_brdf_tpu.sensors.tls import build_tls_rays
    raygen_noise = noise_mod.make_raygen_noise(jax.random.PRNGKey(1))

    def f(pos):
        r = build_tls_rays(cfg, raygen_noise, position=pos)
        cloud = simulate_chunk(scene, bvh, materials, r, noise, scalars, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.distance, 0.0))

    pos0 = jnp.array([0.0, 10.0, 0.0])
    g = jax.grad(f)(pos0)
    assert np.isfinite(np.asarray(g)).all()
    # moving the sensor up increases ground ranges: dy-grad positive & by far
    # the dominant component for a mostly-downward scan
    assert float(g[1]) > 0
    eps = 1e-2
    fd = (float(f(pos0 + jnp.array([0, eps, 0.0])))
          - float(f(pos0 - jnp.array([0, eps, 0.0])))) / (2 * eps)
    ad = float(g[1])
    assert abs(fd - ad) <= 0.05 * max(abs(fd), abs(ad))


def test_vertex_gradients_match_fd(rng):
    """d(sum distance)/d(vertex positions) via the fixed-topology refine."""
    v, f_ = synthetic.ground_plane(half=30.0, y=0.0)
    scene = synthetic.scene_from_arrays(v, f_)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        tls_position=(0.0, 10.0, 0.0), tls_fov_vertical=30.0,
        tls_middle_angle_vertical=-75.0, tls_fov_horizontal=360.0,
        tls_resolution_horizontal=8, tls_resolution_vertical=4,
        rays_per_pulse=1, max_returns=1, chunk_pulses=32,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False, tls_angle_jittering=0.0)
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))

    def f(verts):
        s = scene.__class__(**{**scene.__dict__, "vertices": verts})
        cloud = simulate_chunk(s, bvh, materials, rays, noise, scalars, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.distance, 0.0))

    _fd_check(f, jnp.asarray(scene.vertices), eps=1e-3, n_probes=4, rng=rng)
