"""Water refraction + bathymetric (green-laser) pipeline tests."""

import numpy as np
import jax.numpy as jnp

from lidar_brdf_tpu.api import simulate
from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
from lidar_brdf_tpu.core.types import SURFACE_TERRAIN, SURFACE_WATER
from lidar_brdf_tpu.io import synthetic


def water_over_ground_scene():
    """Ground plane at y=0 with a water surface at y=2 above it."""
    gv, gf = synthetic.ground_plane(half=30.0, y=0.0)
    wv, wf = synthetic.ground_plane(half=30.0, y=2.0)
    verts = np.concatenate([gv, wv])
    faces = np.concatenate([gf, wf + len(gv)])
    comp_of_face = np.concatenate([np.zeros(len(gf), np.int32),
                                   np.ones(len(wf), np.int32)])
    return synthetic.scene_from_arrays(
        verts, faces, comp_of_face=comp_of_face, num_components=2,
        comp_material=np.array([7, 6], np.int32),       # STONE, WATER
        comp_surface=np.array([SURFACE_TERRAIN, SURFACE_WATER], np.int32),
        comp_asprs=np.array([2, 9], np.int32))


def _als_cfg(**kw):
    base = dict(
        lidar_type=LiDARType.AERIAL_LINEAR,
        als_position=(0.0, 30.0, 0.0),
        als_fov_horizontal=30.0,
        als_speed=10.0, als_scan_frequency=4, als_pulse_frequency=200,
        rays_per_pulse=2, max_returns=3, chunk_pulses=2048,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=False,
        bathymetric=True, water_height=2.0,
        wavelength_nm=(532, 532))
    base.update(kw)
    return SensorConfig(**base)


def test_bathymetric_two_returns(rng):
    scene = water_over_ground_scene()
    cfg = _als_cfg()
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    assert m.sum() > 10
    asprs = np.asarray(cloud.asprs)[m]
    rn = np.asarray(cloud.return_number)[m]
    pos = np.asarray(cloud.position)[m]
    inten = np.asarray(cloud.intensity)[m]
    # first returns on the water surface
    water_hits = (asprs == 9)
    assert water_hits.sum() > 0
    np.testing.assert_allclose(pos[water_hits][:, 1], 2.0, atol=0.05)
    # second returns under water (refracted rays reach the ground)
    under = (asprs == 2) & (rn >= 1)
    assert under.sum() > 0, "no bathymetric second returns"
    assert pos[under][:, 1].max() < 0.5
    assert np.isfinite(inten).all()
    assert (inten[under] >= 0).all()


def test_water_single_bounce_without_bathymetric(rng):
    """Without bathymetric mode, water is only valid as a first return and
    the loss of later water returns follows `validateCollision`'s water
    rule."""
    scene = water_over_ground_scene()
    cfg = _als_cfg(bathymetric=False, wavelength_nm=(1064, 1064))
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    asprs = np.asarray(cloud.asprs)[m]
    rn = np.asarray(cloud.return_number)[m]
    # water never appears as a non-first return
    assert ((asprs != 9) | (rn == 0)).all()


def test_auto_bathymetric_by_wavelength(rng):
    """simulate_spectral flips bathymetric on for <533nm aerial scans."""
    from lidar_brdf_tpu.api import simulate_spectral
    scene = water_over_ground_scene()
    cfg = _als_cfg(bathymetric=False, wavelength_nm=(532, 532))
    clouds = simulate_spectral(scene, cfg)
    cloud = clouds[532]
    m = np.asarray(cloud.mask)
    asprs = np.asarray(cloud.asprs)[m]
    rn = np.asarray(cloud.return_number)[m]
    under = (asprs == 2) & (rn >= 1)
    assert under.sum() > 0


def test_hybrid_culled_matches_packet_on_water(rng):
    """Water scenes run the hybrid (culled level 0 + packet bounces); it
    must produce the same cloud as the pure packet path."""
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.runtime.simulate import Simulator
    scene = water_over_ground_scene()
    cfg = _als_cfg()
    bvh = build_scene_bvh(scene)
    mats = MaterialLibrary.default().table_at(532)
    rays = build_rays(cfg, scene)
    sim_h = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                      reorder=False)
    sim_p = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                      use_culled=False)
    assert sim_h._culled_active and sim_h.scene_has_water
    ch = sim_h.run(rays)
    cp = sim_p.run(rays)
    mh, mp = np.asarray(ch.mask), np.asarray(cp.mask)
    assert mh.sum() == mp.sum() > 0

    def rows(c, m):
        # unique stable key per point: (pulse gps time, return number)
        key = np.lexsort((np.asarray(c.return_number)[m],
                          np.asarray(c.gps_time)[m]))
        return np.asarray(c.position)[m][key]

    # first-hit t differs between the Wald (culled) and Moller-Trumbore
    # (packet) arithmetic at f32 rounding; refraction amplifies that to
    # ~0.5 mm on sub-surface returns — compare at 1 cm
    np.testing.assert_allclose(rows(ch, mh), rows(cp, mp), atol=1e-2)
