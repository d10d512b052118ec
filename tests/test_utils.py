"""Utility module tests: analysis exports, regular grid, paths, sensors."""

import math

import numpy as np

from lidar_brdf_tpu.sensors import paths as paths_mod
from lidar_brdf_tpu.utils import analysis
from lidar_brdf_tpu.utils.regular_grid import RegularGrid


def test_douglas_peucker_reduces_collinear():
    pts = np.array([[0, 0], [1, 0.001], [2, -0.001], [3, 0], [3, 5]],
                   np.float32)
    out = paths_mod.douglas_peucker(pts, epsilon=0.1)
    assert len(out) == 3
    np.testing.assert_allclose(out[0], [0, 0])
    np.testing.assert_allclose(out[-1], [3, 5])


def test_catmull_rom_passes_through_waypoints():
    wp = np.array([[0, 0, 0, 1], [1, 2, 0, 1], [2, 0, 0, 1], [3, 1, 0, 1]],
                  np.float64)
    keys = [i / len(wp) for i in range(len(wp))]
    cr = paths_mod.CatmullRomPath(wp, keys)
    np.testing.assert_allclose(cr.position(0.0), wp[0])
    np.testing.assert_allclose(cr.position(1.0), wp[-1])
    # near a middle key: close to its waypoint
    p = cr.position(keys[2])
    assert np.linalg.norm(p[:3] - wp[2][:3]) < 0.4


def test_bezier_endpoints():
    bp = paths_mod.BezierPath(np.array([[0, 0], [1, 5], [2, 0]], np.float64))
    np.testing.assert_allclose(bp.position(0.0), [0, 0])
    np.testing.assert_allclose(bp.position(1.0), [2, 0])
    mid = bp.position(0.5)
    assert 0 < mid[1] < 5


def test_sweep_planning():
    steps, width = paths_mod.num_sweeps(
        fov_deg=60.0, als_height=100.0, aabb_min=np.array([-50, 0, -50.0]),
        aabb_max=np.array([50, 10, 50.0]), overlapping=0.5)
    expect_width = 2 * math.tan(math.radians(30)) * 90.0
    assert abs(width - expect_width) < 1e-6
    assert steps == math.ceil(100.0 / (expect_width * 0.5))
    plans = paths_mod.auto_sweep_paths(
        np.array([-50, 0, -50.0]), np.array([50, 10, 50.0]), 100.0, 60.0,
        0.5, 200)
    assert len(plans) == steps


def test_retrieve_waypoints_equal_counts():
    p1 = paths_mod.LinearPath(np.array([[0, 0, 0, 1], [10, 0, 0, 1.0]]))
    p2 = paths_mod.LinearPath(np.array([[0, 0, 5, 1], [10, 0, 5, 1.0]]))
    wps = paths_mod.retrieve_waypoints([p1, p2], 0.25)
    assert len(wps) % 2 == 0
    assert len(wps) == 2 * 5      # floor(1/0.25)+1 per path


def test_regular_grid_placement():
    rng = np.random.default_rng(0)
    grid = RegularGrid([-10, 0, -10], [10, 5, 10], 8, 8)
    pts = grid.sample_free_positions(rng, 20, max_density=0.0)
    assert len(pts) == 20
    # all placed cells now occupied
    assert grid.density.sum() == 20


def test_class_counts_and_histogram(rng):
    from lidar_brdf_tpu.api import simulate
    from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode
    from lidar_brdf_tpu.io import synthetic
    scene = synthetic.terrain_with_boxes(rng, num_boxes=3)
    cfg = SensorConfig(
        tls_position=(0.0, 9.0, 0.0), tls_fov_vertical=70.0,
        tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=24, tls_resolution_vertical=8,
        rays_per_pulse=1, max_returns=1, chunk_pulses=192,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    cloud = simulate(scene, cfg)
    counts = analysis.class_counts(cloud)
    assert counts.get("GROUND", 0) > 0
    m = np.asarray(cloud.mask)
    h, edges = analysis.histogram(np.asarray(cloud.distance)[m], 10)
    tex = analysis.histogram_to_pgfplots(h, edges, "ranges")
    assert "addplot" in tex


def test_helios_export(tmp_path):
    p = tmp_path / "spec.txt"
    analysis.export_helios_spectra(str(p), np.array([400.0, 1000.0]),
                                   np.array([0.3, 0.6]), "LEAF")
    text = p.read_text()
    assert "Hemispherical Reflectance" in text
    assert "0.4\t0.3" in text
