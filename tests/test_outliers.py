"""Atmospheric-outlier semantics (`addOutlier-comp.glsl:29-64`).

The reference draws outlier noise per *collision-buffer index*, which
restarts every return level — a pulse flagged as an outlier at level 0 is
not automatically re-flagged at level 1.  These tests pin that
decorrelation plus the basic outlier record shape (spurious point along
the winner ray's previous direction, parametric distance in
``outlier_range * corrected``, ASPRS NOISE label).
"""

import jax
import numpy as np

from lidar_brdf_tpu.api import build_scene_bvh, simulate
from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
from lidar_brdf_tpu.core.types import RayBundle, SURFACE_TERRAIN
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.physics.returns import SimScalars, simulate_returns
from lidar_brdf_tpu.utils import noise as noise_mod


def stacked_planes_scene():
    """Ground at y=0 plus a smaller shelf at y=5 (edge at x=0): pulses
    straddling the edge produce two well-separated returns."""
    gv, gf = synthetic.ground_plane(half=50.0, y=0.0)
    sv, sf = synthetic.ground_plane(half=10.0, y=5.0)
    sv = sv + np.array([-10.0, 0.0, 0.0], np.float32)  # shelf covers x<0
    v = np.concatenate([gv, sv])
    f = np.concatenate([gf, sf + len(gv)])
    comp = np.concatenate([np.zeros(len(gf), np.int32),
                           np.ones(len(sf), np.int32)])
    return synthetic.scene_from_arrays(
        v, f, comp_of_face=comp, num_components=2,
        comp_surface=np.array([SURFACE_TERRAIN, 0], np.int32))


def edge_rays(num_pulses=512):
    """Pulses of 2 rays straddling the shelf edge: ray 0 hits the shelf
    (y=5), ray 1 hits the ground (y=0) — far outside the footprint and a
    different component, so every pulse gets 2 returns."""
    z = np.linspace(-8.0, 8.0, num_pulses, dtype=np.float32)
    o0 = np.stack([np.full_like(z, -0.5), np.full_like(z, 20.0), z], -1)
    o1 = np.stack([np.full_like(z, +0.5), np.full_like(z, 20.0), z], -1)
    origin = np.stack([o0, o1], axis=1)                       # (P, 2, 3)
    direction = np.tile(np.array([0.0, -1.0, 0.0], np.float32),
                        (num_pulses, 2, 1))
    return RayBundle(origin=origin, direction=direction,
                     gps_time=np.zeros(num_pulses, np.float32))


def run_returns(cfg, scene, rays):
    import functools
    bvh = build_scene_bvh(scene)
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise_buf = noise_mod.make_sim_noise(jax.random.PRNGKey(cfg.seed))
    fn = jax.jit(functools.partial(simulate_returns, cfg=cfg,
                                   scene_has_water=False))
    return fn(scene, bvh, materials, rays, noise_buf, scalars)


def outlier_cfg(**kw):
    base = dict(lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
                rays_per_pulse=2, max_returns=2, max_range=200.0,
                pulse_radius=0.0001, include_outliers=True,
                include_shiny_surface_error=False,
                shading_mode=ShadingMode.LAMBERTIAN)
    base.update(kw)
    return SensorConfig(**base)


def test_outliers_decorrelated_across_levels():
    """The outlier draw must differ between return levels of one pulse."""
    scene = stacked_planes_scene()
    rays = edge_rays()
    cfg = outlier_cfg(outlier_threshold=0.0)     # ~50% of collisions
    records, outliers, num_returns, _ = run_returns(cfg, scene, rays)
    rmask = np.asarray(records.mask)
    omask = np.asarray(outliers.mask)
    both = rmask[0] & rmask[1]
    assert both.sum() > 200, f"scene setup broke: {both.sum()} 2-return pulses"
    f0, f1 = omask[0][both], omask[1][both]
    # pre-fix these were bit-identical (same noise row reused per level)
    assert (f0 != f1).any(), "outlier draws identical across return levels"
    assert 0.2 < f0.mean() < 0.8 and 0.2 < f1.mean() < 0.8
    # parametric distance draw must differ across levels too
    d = np.asarray(outliers.distance)
    c = np.asarray(records.distance)
    r0 = d[0][both] / np.maximum(c[0][both], 1e-9)
    r1 = d[1][both] / np.maximum(c[1][both], 1e-9)
    assert not np.allclose(r0, r1)


def test_outlier_records_along_ray():
    """Outlier points lie on the winner ray at distance within
    outlier_range * corrected (`addOutlier-comp.glsl:45-48`)."""
    scene = stacked_planes_scene()
    rays = edge_rays(num_pulses=128)
    cfg = outlier_cfg(outlier_threshold=-1.0,    # every collision spawns one
                      outlier_range=(0.2, 0.9))
    records, outliers, _, _ = run_returns(cfg, scene, rays)
    rmask = np.asarray(records.mask)
    omask = np.asarray(outliers.mask)
    assert (omask == rmask).all(), "threshold -1 must flag every collision"
    pt = np.asarray(outliers.point)
    dist = np.asarray(outliers.distance)
    start = np.asarray(records.start)
    corr = np.asarray(records.distance)
    for L in range(2):
        m = omask[L]
        ratio = dist[L][m] / corr[L][m]
        # noise in [0,1] * 1.5 mapped through range (0.2, 0.9)
        assert ratio.min() >= 0.2 - 1e-5
        assert ratio.max() <= 0.2 + 1.5 * 0.7 + 1e-4
        # point = start + prev_dir * distance; rays point straight down
        d_vec = pt[L][m] - start[L][m]
        assert np.allclose(d_vec[:, [0, 2]], 0.0, atol=1e-4)
        assert np.allclose(-d_vec[:, 1], dist[L][m], atol=1e-3)


def test_outliers_labeled_noise_in_cloud(rng):
    """End-to-end: outlier slots surface in the PointCloud as ASPRS 7."""
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_resolution_horizontal=48, tls_resolution_vertical=16,
        tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
        tls_middle_angle_vertical=-40.0, tls_position=(0.0, 8.0, 0.0),
        rays_per_pulse=1, max_returns=1, chunk_pulses=1024,
        include_outliers=True, outlier_threshold=0.5,
        shading_mode=ShadingMode.LAMBERTIAN)
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    asprs = np.asarray(cloud.asprs)[m]
    comp = np.asarray(cloud.comp_id)[m]
    n_outliers = int(((asprs == 7) & (comp == -1)).sum())
    n_real = int((comp >= 0).sum())
    assert n_real > 100
    assert 0 < n_outliers < n_real    # ~25% of valid collisions
