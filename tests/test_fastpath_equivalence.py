"""The gradient-opaque no-retraverse path must match the scan path exactly.

On a water-free scene, ray origins/directions never change across return
levels, so re-traversing for bounce levels (the retraverse scan path,
``scene_has_water=True``) finds exactly the same per-ray hits as reusing
the level-0 traversal — the two code paths in `physics/returns.py` must
produce identical records AND identical gradients.  This pins the round-4
restructure (discrete level loop + one vectorized differentiable record
pass) to the original semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_brdf_tpu.api import build_rays, build_scene_bvh
from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.physics.returns import SimScalars, simulate_returns
from lidar_brdf_tpu.runtime.simulate import simulate_chunk
from lidar_brdf_tpu.utils import noise as noise_mod


def _workload(rng, max_returns=3, rays_per_pulse=6):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=5)
    from lidar_brdf_tpu.api import attach_face_neighbors
    scene = attach_face_neighbors(scene)
    bvh = build_scene_bvh(scene)
    # device arrays: the retraverse scan path indexes scene tables with
    # tracers inside lax.scan (fine under jit; numpy leaves break untraced)
    scene = jax.tree.map(jnp.asarray, scene)
    bvh = jax.tree.map(jnp.asarray, bvh)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_resolution_horizontal=48, tls_resolution_vertical=12,
        tls_fov_horizontal=360.0, tls_fov_vertical=80.0,
        tls_middle_angle_vertical=-35.0, tls_position=(0.0, 9.0, 0.0),
        rays_per_pulse=rays_per_pulse, pulse_radius=0.02,
        max_returns=max_returns, max_range=300.0,
        include_shiny_surface_error=True,
        include_terrain_induced_error=True,
        include_outliers=True,
        shading_mode=ShadingMode.MEASURED,
    )
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(3))
    scalars = SimScalars.from_config(cfg, 0.0)
    return scene, bvh, cfg, rays, materials, scalars, noise


@pytest.mark.parametrize("max_returns", [1, 3])
def test_records_match_scan_path(rng, max_returns):
    scene, bvh, cfg, rays, materials, scalars, noise = _workload(
        rng, max_returns=max_returns)

    fast = simulate_returns(scene, bvh, materials, rays, noise, scalars,
                            cfg, scene_has_water=False)
    slow = simulate_returns(scene, bvh, materials, rays, noise, scalars,
                            cfg, scene_has_water=True)
    names = type(fast[0]).__dataclass_fields__.keys()
    for name in names:
        a = np.asarray(getattr(fast[0], name))
        b = np.asarray(getattr(slow[0], name))
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-6,
            err_msg=f"record field {name} diverged between paths")
    for name in type(fast[1]).__dataclass_fields__.keys():
        np.testing.assert_allclose(
            np.asarray(getattr(fast[1], name)),
            np.asarray(getattr(slow[1], name)), rtol=1e-6, atol=1e-6,
            err_msg=f"outlier field {name} diverged between paths")
    np.testing.assert_array_equal(np.asarray(fast[2]), np.asarray(slow[2]))


def test_full_gradients_match_scan_path(rng):
    """d loss / d {table, origin, vertices} identical on both paths."""
    scene, bvh, cfg, rays, materials, scalars, noise = _workload(
        rng, max_returns=2)

    def loss(table, origin, verts, has_water):
        mats = materials.__class__(**{**materials.__dict__,
                                      "brdf_table": table})
        sc = scene.__class__(**{**scene.__dict__, "vertices": verts})
        rb = rays.__class__(origin=origin, direction=rays.direction,
                            gps_time=rays.gps_time)
        cloud = simulate_chunk(sc, bvh, mats, rb, noise, scalars, cfg,
                               scene_has_water=has_water)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    args = (materials.brdf_table, rays.origin, scene.vertices)
    g_fast = jax.grad(loss, argnums=(0, 1, 2))(*args, False)
    g_slow = jax.grad(loss, argnums=(0, 1, 2))(*args, True)
    for name, a, b in zip(("table", "origin", "vertices"), g_fast, g_slow):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"{name} grad has non-finite entries"
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-5, atol=2e-5,
            err_msg=f"{name} gradient diverged between paths")
