"""User-drawn ALS flight paths (`getAirbonePaths` manual branch,
RayBuilder.cpp:146-213): canvas -> world mapping, Douglas-Peucker +
Catmull-Rom handoff, config JSON round-trip, and an end-to-end manual-path
simulation whose hits follow the drawn line."""

import json

import numpy as np

from lidar_brdf_tpu.api import simulate
from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.sensors.als import plan_flight
from lidar_brdf_tpu.sensors.paths import manual_path


def als_cfg(**kw):
    base = dict(
        lidar_type=LiDARType.AERIAL_ZIGZAG,
        als_position=(0.0, 40.0, 0.0),
        als_fov_horizontal=30.0, als_scan_frequency=10,
        als_pulse_frequency=320, als_speed=4.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=4096,
        include_shiny_surface_error=False,
        shading_mode=ShadingMode.LAMBERTIAN)
    base.update(kw)
    return SensorConfig(**base)


def test_canvas_to_world_mapping():
    """pathPoint * sceneSize / canvasSize + sceneMin at constant height
    (RayBuilder.cpp:155-160, BOUNDARY_OFFSET == 0 in the release)."""
    aabb_min = np.array([-30.0, 0.0, -20.0])
    aabb_max = np.array([30.0, 5.0, 20.0])
    canvas = (200.0, 100.0)
    # corners + center of the canvas; collinear midpoints are DP-simplified
    pts = [(0.0, 0.0), (100.0, 50.0), (200.0, 100.0)]
    paths = manual_path(pts, canvas, aabb_min, aabb_max, 40.0,
                        epsilon=0.5, use_catmull_rom=False)
    assert len(paths) == 1
    w = paths[0].waypoints
    np.testing.assert_allclose(w[0, :3], [-30.0, 40.0, -20.0], atol=1e-5)
    np.testing.assert_allclose(w[-1, :3], [30.0, 40.0, 20.0], atol=1e-5)
    # the collinear middle point is removed by Douglas-Peucker
    assert len(w) == 2


def test_manual_path_flows_into_plan():
    """SensorConfig.als_manual_path reaches plan_flight (the round-1 dead
    getattr is gone): a drawn diagonal produces ONE path whose waypoints
    trace the diagonal, instead of auto parallel sweeps."""
    scene = synthetic.terrain_with_boxes(np.random.default_rng(0),
                                         num_boxes=0, half=40.0)
    lo, hi = scene.aabb()
    cfg = als_cfg(als_manual_path=((0.0, 0.0), (1.0, 1.0)),
                  als_manual_canvas_size=(1.0, 1.0),
                  use_catmull_rom=False)
    plan = plan_flight(cfg, np.asarray(lo), np.asarray(hi))
    assert plan.num_paths == 1
    w = plan.waypoints
    # diagonal: x and z increase together, spanning the scene AABB
    assert w[0, 0] < w[-1, 0] and w[0, 2] < w[-1, 2]
    np.testing.assert_allclose(w[:, 1], 40.0, atol=1e-4)
    # waypoints lie on the x==z*aspect diagonal (square scene: x == z)
    np.testing.assert_allclose(w[:, 0], w[:, 2], atol=1e-3)

    auto_plan = plan_flight(cfg.with_(als_manual_path=None),
                            np.asarray(lo), np.asarray(hi))
    assert auto_plan.num_paths > 1          # sanity: auto is different


def test_config_json_roundtrip_manual_path():
    cfg = als_cfg(als_manual_path=((1.0, 2.0), (3.5, 4.0), (10.0, 2.0)),
                  als_manual_canvas_size=(64.0, 32.0))
    cfg2 = SensorConfig.from_json(cfg.to_json())
    assert cfg2.als_manual_path == cfg.als_manual_path
    assert cfg2.als_manual_canvas_size == cfg.als_manual_canvas_size
    assert isinstance(cfg2.als_manual_path[0], tuple)  # hashable (jit key)
    hash(cfg2)                                          # frozen + hashable
    # None round-trips too
    cfg3 = SensorConfig.from_json(als_cfg().to_json())
    assert cfg3.als_manual_path is None


def test_manual_path_simulation_hits_along_line(rng):
    """End-to-end: a drawn straight line across a flat scene produces hits
    clustered under the line (nadir fan), not across the whole scene."""
    v, f = synthetic.ground_plane(half=40.0, y=0.0, cells=2)
    scene = synthetic.scene_from_arrays(v, f)
    # straight line along z at canvas x = 0.25 -> world x = -20
    cfg = als_cfg(als_manual_path=((0.25, 0.0), (0.25, 1.0)),
                  als_manual_canvas_size=(1.0, 1.0),
                  use_catmull_rom=False, als_fov_horizontal=14.0)
    cloud = simulate(scene, cfg)
    m = np.asarray(cloud.mask)
    assert m.sum() > 200, f"manual-path scan produced {m.sum()} hits"
    pos = np.asarray(cloud.position)[m]
    # the scan fan sweeps across-track around the flight line x=-20:
    # swath = tan(7 deg) * 40m = ~4.9m half-width
    assert abs(np.median(pos[:, 0]) - (-20.0)) < 1.5
    assert np.percentile(np.abs(pos[:, 0] + 20.0), 95) < 6.0
    # along-track coverage spans most of the scene depth
    assert pos[:, 2].max() - pos[:, 2].min() > 80 * 0.7


def test_cli_als_path_file(tmp_path, rng):
    """--als-path waypoints.json wires the drawn path into the config."""
    from lidar_brdf_tpu import cli
    path_file = tmp_path / "wp.json"
    path_file.write_text(json.dumps(
        {"points": [[0.25, 0.0], [0.25, 1.0]], "canvas_size": [1.0, 1.0]}))
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(als_cfg().to_json())
    out = tmp_path / "c.ply"
    rc = cli.main(["simulate", "--scene", ":demo:",
                   "--config", str(cfg_file),
                   "--als-path", str(path_file), "--out", str(out)])
    assert rc == 0 and out.exists()
