"""End-to-end pipeline tests (BASELINE config 1 and beyond)."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_brdf_tpu.api import simulate, build_rays, build_scene_bvh
from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
from lidar_brdf_tpu.io import synthetic


def small_tls_cfg(**kw):
    base = dict(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_resolution_horizontal=48,
        tls_resolution_vertical=24,
        tls_fov_horizontal=360.0,
        tls_fov_vertical=90.0,
        tls_middle_angle_vertical=-30.0,
        tls_position=(0.0, 8.0, 0.0),
        rays_per_pulse=1,
        max_returns=1,
        max_range=200.0,
        chunk_pulses=2048,
        include_shiny_surface_error=False,
        shading_mode=ShadingMode.LAMBERTIAN,
    )
    base.update(kw)
    return SensorConfig(**base)


def test_tls_single_return_lambertian(rng):
    """Minimum end-to-end slice: TLS, 1 ray/beam, Lambertian, ground scene."""
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4)
    cfg = small_tls_cfg()
    cloud = simulate(scene, cfg)
    n = int(np.asarray(cloud.mask).sum())
    assert n > 100, f"expected many ground hits, got {n}"
    m = np.asarray(cloud.mask)
    pos = np.asarray(cloud.position)[m]
    inten = np.asarray(cloud.intensity)[m]
    dist = np.asarray(cloud.distance)[m]
    # Points must lie in the scene, below the sensor.
    assert pos[:, 1].max() < 8.1
    assert (dist > 0).all() and (dist < 200.0).all()
    assert (inten >= 0).all() and inten.max() > 0
    # Intensity decays with distance^2 modulo cosine: sanity-check monotonic
    # trend between very near and very far ground points.
    near = inten[dist < np.percentile(dist, 10)].mean()
    far = inten[dist > np.percentile(dist, 90)].mean()
    assert near > far


def test_distance_matches_geometry(rng):
    """Downward rays over a flat plane: range must equal height/cos(angle)."""
    v, f = synthetic.ground_plane(half=100.0, y=0.0)
    scene = synthetic.scene_from_arrays(v, f)
    cfg = small_tls_cfg(tls_position=(0.0, 10.0, 0.0),
                        tls_fov_vertical=40.0,
                        tls_middle_angle_vertical=-70.0,
                        tls_angle_jittering=0.0)
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    assert m.sum() > 50
    pos = np.asarray(cloud.position)[m]
    dist = np.asarray(cloud.distance)[m]
    sensor = np.array([0.0, 10.0, 0.0])
    np.testing.assert_allclose(np.linalg.norm(pos - sensor, axis=1), dist,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pos[:, 1], 0.0, atol=1e-3)


def test_multi_return_extracts_behind_surface(rng):
    """A small box in front of a big wall: beam footprint splitting should
    yield second returns from the wall behind the box edge."""
    # wall at z=10, box edge at z=5 partially covering beams
    wv, wf = synthetic.ground_plane(half=20.0, y=0.0)
    # rotate ground plane to be a wall at z = +10 facing -z
    wv = wv[:, [0, 2, 1]].astype(np.float32)
    wv[:, 2] += 10.0
    bv, bf = synthetic.box((0.0, 0.0, 5.0), (0.5, 0.5, 0.5))
    verts = np.concatenate([wv, bv])
    faces = np.concatenate([wf, bf + len(wv)])
    comp_of_face = np.concatenate([np.zeros(len(wf), np.int32),
                                   np.ones(len(bf), np.int32)])
    scene = synthetic.scene_from_arrays(
        verts, faces, comp_of_face=comp_of_face, num_components=2)
    cfg = small_tls_cfg(
        tls_position=(0.0, 0.0, 0.0),
        tls_fov_horizontal=200.0,
        tls_fov_vertical=30.0,
        tls_middle_angle_vertical=0.0,
        tls_middle_angle_horizontal=-90.0,  # sphere(h=-90deg) = (0,0,1) -> +z
        rays_per_pulse=8,
        pulse_radius=0.01,
        max_returns=3,
        tls_resolution_horizontal=64,
        tls_resolution_vertical=16,
    )
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    rn = np.asarray(cloud.return_number)[m]
    nr = np.asarray(cloud.num_returns)[m]
    assert m.sum() > 0
    assert (nr >= rn + 1).all()
    # some pulse should have produced >= 2 returns
    assert nr.max() >= 2


def test_gradients_flow_to_vertices_and_power(rng):
    """Differentiability: d(sum intensity)/d(vertices, peak_power) nonzero."""
    v, f = synthetic.ground_plane(half=30.0, y=0.0)
    scene = synthetic.scene_from_arrays(v, f)
    bvh = build_scene_bvh(scene)
    cfg = small_tls_cfg(tls_position=(0.0, 10.0, 0.0),
                        tls_fov_vertical=30.0,
                        tls_middle_angle_vertical=-75.0,
                        tls_resolution_horizontal=16,
                        tls_resolution_vertical=8,
                        chunk_pulses=16 * 8)
    rays = build_rays(cfg, scene)

    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.utils import noise as noise_mod
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise_buf = noise_mod.make_sim_noise(jax.random.PRNGKey(0))

    def loss(vertices, peak_power):
        s = scene.__class__(**{**scene.__dict__, "vertices": vertices})
        sc = scalars.__class__(**{**scalars.__dict__,
                                  "peak_power": peak_power})
        cloud = simulate_chunk(s, bvh, materials, rays, noise_buf, sc, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    g_v, g_p = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(scene.vertices), jnp.float32(65.0))
    assert np.isfinite(np.asarray(g_v)).all()
    assert abs(float(g_p)) > 0
    assert np.abs(np.asarray(g_v)).sum() > 0


def test_als_linear_scan(rng):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4, half=30.0)
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_LINEAR,
        als_position=(0.0, 40.0, 0.0),
        als_fov_horizontal=60.0,
        als_speed=8.0,
        als_scan_frequency=4,
        als_pulse_frequency=400,
        rays_per_pulse=1,
        max_returns=1,
        chunk_pulses=4096,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False,
    )
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    assert m.sum() > 100
    pos = np.asarray(cloud.position)[m]
    assert pos[:, 1].max() < 40.0
    assert pos[:, 1].min() > -1.0
