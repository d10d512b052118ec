"""Ortho backdrop rasterizer (viz.render_ortho) — the path-drawing canvas
background (`LiDARScene.cpp:118-163`, `GUI.cpp:160-272`)."""

import numpy as np

from lidar_brdf_tpu import viz
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.png import read_png


def _scene_with_box():
    gv, gf = synthetic.ground_plane(half=10.0, y=0.0)
    # unit box top at the center, elevated
    bv = np.array([[-2, 3, -2], [2, 3, -2], [2, 3, 2], [-2, 3, 2]],
                  np.float32)
    bf = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    v = np.concatenate([gv, bv])
    f = np.concatenate([gf, bf + len(gv)])
    comp = np.concatenate([np.zeros(len(gf), np.int32),
                           np.ones(len(bf), np.int32)])
    kad = np.concatenate([
        np.tile(np.array([[0.1, 0.6, 0.1]], np.float32), (len(gv), 1)),
        np.tile(np.array([[0.9, 0.1, 0.1]], np.float32), (len(bv), 1))])
    return synthetic.scene_from_arrays(
        v, f, comp_of_face=comp, num_components=2,
        comp_semantic=np.array([0, 1], np.int32),
        comp_asprs=np.array([2, 6], np.int32), vertex_kad=kad)


def test_render_ortho_zbuffer_and_mapping(tmp_path):
    scene = _scene_with_box()
    out = viz.render_ortho(scene, str(tmp_path / "ortho.png"), mode="kad",
                           size=128)
    img = np.asarray(read_png(out["path"]), np.float32)   # floats in [0,1]
    assert img.shape == (128, 128, 3)
    W, H = out["canvas_size"]
    # center pixel: the elevated RED box must occlude the green ground
    c = img[H // 2, W // 2]
    assert c[0] > 0.5 and c[1] < 0.3, f"box not on top at center: {c}"
    # corner: ground green
    g = img[5, 5]
    assert g[1] > 0.3 and g[0] < 0.3, f"ground missing at corner: {g}"
    # canvas->world mapping must round-trip through tls_path_from_canvas
    from lidar_brdf_tpu.api import tls_path_from_canvas
    px = np.array([[W / 2, H / 2], [0.0, 0.0]])
    world = tls_path_from_canvas(px, (W, H), scene, height=1.5,
                                 douglas_peucker_epsilon=0.0)
    np.testing.assert_allclose(world[0], [0.0, 1.5, 0.0], atol=1e-5)
    np.testing.assert_allclose(world[-1], [-10.0, 1.5, -10.0], atol=1e-5)


def test_render_ortho_label_modes(tmp_path):
    scene = _scene_with_box()
    for mode in ("semantic", "asprs", "height"):
        out = viz.render_ortho(scene, str(tmp_path / f"o_{mode}.png"),
                               mode=mode, size=64)
        img = read_png(out["path"])
        assert img.shape == (64, 64, 3)
        assert img.max() > 0


def test_render_overlays(tmp_path, rng):
    """Overlay PNG (rays / BVH boxes / beam cone / max-range disc) renders
    and is non-trivially sized — the scripted stand-in for the reference
    viewer's overlay draws (`LiDARScene.cpp:269-330`)."""
    import os

    from lidar_brdf_tpu import viz
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh, simulate
    from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode
    from lidar_brdf_tpu.io import synthetic

    scene = synthetic.terrain_with_boxes(rng, num_boxes=3)
    cfg = SensorConfig(
        tls_position=(0.0, 9.0, 0.0), tls_fov_horizontal=120.0,
        tls_fov_vertical=60.0, tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=24, tls_resolution_vertical=8,
        rays_per_pulse=1, max_range=60.0,
        shading_mode=ShadingMode.LAMBERTIAN)
    bvh = build_scene_bvh(scene)
    rays = build_rays(cfg, scene)
    cloud = simulate(scene, cfg)
    out = str(tmp_path / "overlays.png")
    viz.render_overlays(scene, cloud, cfg, out, bvh=bvh, rays=rays,
                        num_rays=50, bvh_depth=3)
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
