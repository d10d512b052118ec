"""Beam-culled dense intersection vs brute-force oracle (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from conftest import make_random_scene
from lidar_brdf_tpu.geom import beamcull, bvh as bvh_mod
from lidar_brdf_tpu.geom.intersect import intersect_brute, moller_trumbore
from lidar_brdf_tpu.io import synthetic


def _check_vs_brute(scene, origin, direction, tile_rays=64):
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    tr = beamcull.CulledTraverser(scene, tile_rays=tile_rays, chunk=32)
    cand = tr.build_candidates(tree, origin, direction)
    fast = tr(jnp.asarray(origin), jnp.asarray(direction), jnp.asarray(cand))
    brute = intersect_brute(scene, jnp.asarray(origin),
                            jnp.asarray(direction))
    fast_hit = np.asarray(fast.face) >= 0
    brute_hit = np.asarray(brute.face) >= 0
    assert (fast_hit == brute_hit).all()
    np.testing.assert_allclose(np.asarray(fast.t)[fast_hit],
                               np.asarray(brute.t)[brute_hit],
                               rtol=1e-4, atol=1e-4)
    # Face ids may differ where two faces are equidistant along the ray
    # (shared edges, coincident coplanar surfaces — e.g. box bottoms lying
    # on the terrain); distances above already match, so only require
    # majority agreement.
    agree = np.asarray(fast.face)[fast_hit] == np.asarray(brute.face)[brute_hit]
    assert agree.mean() > 0.9
    return cand


def test_culled_random_rays_conservative(rng):
    # Incoherent rays make useless (wide) beams — culling must still be
    # conservative and produce oracle-exact hits.
    scene = make_random_scene(rng, num_tris=150)
    origin = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    target = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _check_vs_brute(scene, origin, d)


def test_culled_coherent_fan(rng):
    # A TLS-like fan: shared origin, narrow angular patches per tile.
    scene = synthetic.terrain_with_boxes(rng, num_boxes=5)
    o = np.array([0.0, 8.0, 0.0], np.float32)
    az = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    el = np.linspace(-1.2, -0.2, 16)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(ee) * np.cos(aa), np.sin(ee),
                  np.cos(ee) * np.sin(aa)], axis=-1).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    origin = np.broadcast_to(o, d.shape).copy()
    cand = _check_vs_brute(scene, origin, d, tile_rays=16)
    # Narrow tiles must actually cull: nobody should carry the whole scene.
    per_tile = (np.asarray(cand) >= 0).sum(axis=1)
    assert per_tile.max() < scene.num_faces


def test_wald_rows_match_moller_trumbore(rng):
    scene = make_random_scene(rng, num_tris=32)
    v = np.asarray(scene.vertices)
    f = np.asarray(scene.faces)
    rows = beamcull.wald_rows_np(v, f)
    o = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    tgt = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    for fi in range(len(f)):
        t_mt, u_mt, v_mt, ok_mt = moller_trumbore(
            jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(v[f[fi, 0]]), jnp.asarray(v[f[fi, 1]]),
            jnp.asarray(v[f[fi, 2]]))
        n, np0 = rows[fi, 0:3], rows[fi, 3]
        nu, du = rows[fi, 4:7], rows[fi, 7]
        nv, dv = rows[fi, 8:11], rows[fi, 11]
        nd = d @ n
        ok_det = np.abs(nd) >= 1e-8
        t = (np0 - o @ n) / np.where(ok_det, nd, 1.0)
        u = (o @ nu + du) + t * (d @ nu)
        vv = (o @ nv + dv) + t * (d @ nv)
        sel = np.asarray(ok_mt) & ok_det
        np.testing.assert_allclose(t[sel], np.asarray(t_mt)[sel],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(u[sel], np.asarray(u_mt)[sel],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(vv[sel], np.asarray(v_mt)[sel],
                                   rtol=1e-3, atol=1e-3)


def test_beam_narrowness_detection(rng):
    o = np.zeros((64, 3), np.float32)
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (64, 1))
    d[:, 1] = rng.uniform(-0.05, 0.05, 64)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    assert beamcull.beams_are_narrow(beamcull.tile_beams(o, d, 64))
    d_wide = rng.normal(size=(64, 3)).astype(np.float32)
    d_wide /= np.linalg.norm(d_wide, axis=1, keepdims=True)
    assert not beamcull.beams_are_narrow(beamcull.tile_beams(o, d_wide, 64))


def test_zero_direction_padding_never_hits(rng):
    scene = make_random_scene(rng, num_tris=50)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    tr = beamcull.CulledTraverser(scene, tile_rays=32, chunk=32)
    o = np.zeros((32, 3), np.float32)
    d = np.zeros((32, 3), np.float32)
    d[:5, 0] = 1.0  # a few real rays, rest padding
    cand = tr.build_candidates(tree, o, d)
    hit = tr(jnp.asarray(o), jnp.asarray(d), jnp.asarray(cand))
    assert (np.asarray(hit.face)[5:] == -1).all()


def test_degenerate_triangle_is_ignored(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],       # collinear
                      [0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    scene = synthetic.scene_from_arrays(verts, faces)
    tree = bvh_mod.build_bvh(verts, faces)
    tr = beamcull.CulledTraverser(scene, tile_rays=8, chunk=32)
    o = np.tile(np.array([0.3, 0.3, -1.0], np.float32), (8, 1))
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (8, 1))
    cand = tr.build_candidates(tree, o, d)
    hit = tr(jnp.asarray(o), jnp.asarray(d), jnp.asarray(cand))
    assert (np.asarray(hit.face) == 1).all()


def test_native_culler_matches_numpy(rng, monkeypatch):
    from lidar_brdf_tpu.io.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o = np.zeros((128, 3), np.float32)
    o[:, 1] = 8.0
    az = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    el = np.linspace(-1.2, -0.3, 16)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(ee) * np.cos(aa), np.sin(ee),
                  np.cos(ee) * np.sin(aa)], -1).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    native = beamcull.build_tile_candidates(tree, o, d, tile_rays=16,
                                            pad_to=8)
    monkeypatch.setenv("LIDAR_BRDF_TPU_NO_NATIVE", "1")
    pure = beamcull.build_tile_candidates(tree, o, d, tile_rays=16, pad_to=8)
    assert native.shape[0] == pure.shape[0]
    for t in range(native.shape[0]):
        assert (set(native[t][native[t] >= 0].tolist())
                == set(pure[t][pure[t] >= 0].tolist()))


def test_als_culled_matches_packet(rng):
    # ALS rays: origins move along the flight path; beams must bound the
    # origin spread and still cull correctly.
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.runtime.simulate import Simulator
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_ZIGZAG,
        als_position=(0.0, 30.0, 0.0), als_speed=30.0,
        als_scan_frequency=40, als_pulse_frequency=4000,
        als_fov_horizontal=40.0,
        rays_per_pulse=2, max_returns=2, chunk_pulses=1024,
        shading_mode=ShadingMode.MEASURED)
    mats = MaterialLibrary.default().table_at(1064)
    rays = build_rays(cfg, scene)
    cloud_c = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg).run(rays)
    cloud_p = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                        use_culled=False).run(rays)
    assert int(np.asarray(cloud_c.mask).sum()) \
        == int(np.asarray(cloud_p.mask).sum()) > 0
    ic = np.sort(np.asarray(cloud_c.intensity)[np.asarray(cloud_c.mask)])
    ip = np.sort(np.asarray(cloud_p.intensity)[np.asarray(cloud_p.mask)])
    np.testing.assert_allclose(ic, ip, rtol=1e-4, atol=1e-7)
