"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_brdf_tpu.api import build_rays, build_scene_bvh
from lidar_brdf_tpu.core.config import SensorConfig, LiDARType, ShadingMode
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.parallel import shard as shard_mod
from lidar_brdf_tpu.physics.returns import SimScalars
from lidar_brdf_tpu.runtime.simulate import simulate_chunk
from lidar_brdf_tpu.utils import noise as noise_mod


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    v, f = synthetic.ground_plane(half=40.0, y=0.0, cells=3)
    scene = synthetic.scene_from_arrays(v, f)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 12.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
        tls_middle_angle_vertical=-45.0,
        tls_resolution_horizontal=32, tls_resolution_vertical=16,
        rays_per_pulse=2, max_returns=1, chunk_pulses=512,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=False)
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    return scene, bvh, cfg, rays, materials, scalars, noise


def test_sharded_forward_matches_single_device(setup):
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    assert jax.device_count() == 8
    mesh = shard_mod.ray_mesh()
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False)
    cloud_sharded = fwd(scene, bvh, materials, rays, noise, scalars)
    cloud_single = simulate_chunk(scene, bvh, materials, rays, noise,
                                  scalars, cfg, scene_has_water=False)
    np.testing.assert_allclose(np.asarray(cloud_sharded.intensity),
                               np.asarray(cloud_single.intensity),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(cloud_sharded.mask),
                                  np.asarray(cloud_single.mask))


def test_sharded_train_step_reduces_loss(setup):
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    # target = forward with perturbed tables
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars)
    target = jnp.where(cloud.mask, cloud.intensity * 1.5, 0.0)
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False,
                                        learning_rate=5e-3)
    loss0, materials1, grads = step(scene, bvh, materials, rays, noise,
                                    scalars, target)
    loss1, _, _ = step(scene, bvh, materials1, rays, noise, scalars, target)
    assert float(loss0) > 0
    assert float(loss1) < float(loss0)
    table_grad = np.asarray(grads[2])
    assert np.isfinite(table_grad).all()
    assert np.abs(table_grad).sum() > 0


def test_sharded_train_step_full_gradients(setup):
    """grad_params='full': material + vertex + origin gradients over the
    mesh.  Vertex grads are replicated parameters (psum'd in the shard_map
    transpose) and must equal the single-device gradient; origin grads are
    sharded with the rays."""
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars)
    target = jnp.where(cloud.mask, cloud.intensity * 1.5, 0.0)
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False,
                                        grad_params="full")
    loss, _, grads = step(scene, bvh, materials, rays, noise, scalars,
                          target)
    g_verts = np.asarray(grads["vertices"])
    g_origin = np.asarray(grads["origin"])
    assert g_verts.shape == np.asarray(scene.vertices).shape
    assert g_origin.shape == np.asarray(rays.origin).shape
    assert np.isfinite(g_verts).all() and np.abs(g_verts).sum() > 0
    assert np.isfinite(g_origin).all() and np.abs(g_origin).sum() > 0

    # single-device oracle for the replicated vertex gradient
    def loss_single(verts, origin):
        scn = scene.__class__(**{**scene.__dict__, "vertices": verts})
        rys = rays.__class__(origin=origin, direction=rays.direction,
                             gps_time=rays.gps_time)
        cloud = simulate_chunk(scn, bvh, materials, rys, noise, scalars,
                               cfg, scene_has_water=False)
        pred = jnp.where(cloud.mask, cloud.intensity, 0.0)
        return jnp.sum((pred - target) ** 2)

    gv_ref, go_ref = jax.grad(loss_single, argnums=(0, 1))(
        scene.vertices, rays.origin)
    np.testing.assert_allclose(g_verts, np.asarray(gv_ref),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(g_origin, np.asarray(go_ref),
                               rtol=1e-4, atol=1e-8)


def test_sharded_culled_matches_single_device(setup):
    from lidar_brdf_tpu.geom.beamcull import CulledTraverser
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    tr = CulledTraverser(scene, tile_rays=32, chunk=32)
    buckets = shard_mod.build_sharded_buckets(tr, bvh, rays, mesh)
    buckets_d = shard_mod.shard_buckets_put(buckets, mesh)
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False,
                                    traverse_fn=tr)
    cloud_sharded = fwd(scene, bvh, materials, rays, noise, scalars,
                        buckets_d)
    cloud_single = simulate_chunk(scene, bvh, materials, rays, noise,
                                  scalars, cfg, scene_has_water=False)
    np.testing.assert_allclose(np.asarray(cloud_sharded.intensity),
                               np.asarray(cloud_single.intensity),
                               rtol=1e-4, atol=1e-7)
    assert (np.asarray(cloud_sharded.mask)
            == np.asarray(cloud_single.mask)).all()


def test_sharded_pulse_ladder_matches_single_device(setup):
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    tr = PulseLadderTraverser(scene, rays_per_pulse=cfg.rays_per_pulse,
                              interpret=True)
    data = shard_mod.shard_traverse_data(
        shard_mod.build_sharded_traverse_data(tr, bvh, rays, mesh), mesh)
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False,
                                    traverse_fn=tr)
    cloud_sharded = fwd(scene, bvh, materials, rays, noise, scalars, data)
    cloud_single = simulate_chunk(scene, bvh, materials, rays, noise,
                                  scalars, cfg, scene_has_water=False)
    np.testing.assert_allclose(np.asarray(cloud_sharded.intensity),
                               np.asarray(cloud_single.intensity),
                               rtol=1e-4, atol=1e-7)
    assert (np.asarray(cloud_sharded.mask)
            == np.asarray(cloud_single.mask)).all()


def test_sharded_pulse_ladder_train_step(setup):
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    tr = PulseLadderTraverser(scene, rays_per_pulse=cfg.rays_per_pulse,
                              interpret=True)
    data = shard_mod.shard_traverse_data(
        shard_mod.build_sharded_traverse_data(tr, bvh, rays, mesh), mesh)
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False,
                                    traverse_fn=tr)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars, data)
    target = jnp.where(cloud.mask, cloud.intensity * 1.1, 0.0)
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False,
                                        traverse_fn=tr)
    loss, new_mats, grads = step(scene, bvh, materials, rays, noise,
                                 scalars, target, data)
    assert float(loss) > 0.0
    assert float(jnp.sum(jnp.abs(grads[2]))) > 0.0   # brdf table grads flow


def test_sharded_culled_train_step(setup):
    from lidar_brdf_tpu.geom.beamcull import CulledTraverser
    scene, bvh, cfg, rays, materials, scalars, noise = setup
    mesh = shard_mod.ray_mesh()
    tr = CulledTraverser(scene, tile_rays=32, chunk=32)
    buckets_d = shard_mod.shard_buckets_put(
        shard_mod.build_sharded_buckets(tr, bvh, rays, mesh), mesh)
    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False,
                                    traverse_fn=tr)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars, buckets_d)
    target = jnp.where(cloud.mask, cloud.intensity * 1.1, 0.0)
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False,
                                        traverse_fn=tr)
    loss, new_mats, grads = step(scene, bvh, materials, rays, noise,
                                 scalars, target, buckets_d)
    assert float(loss) > 0.0
    assert float(jnp.sum(jnp.abs(grads[2]))) > 0.0   # brdf table grads flow
