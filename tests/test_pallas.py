"""Pallas culled-intersection kernel (interpret mode) vs oracle.

The kernel itself is exercised on hardware by bench.py; here the interpreter
validates semantics on the CPU mesh (SURVEY.md §4: interpreter-mode Pallas
checks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_random_scene
from lidar_brdf_tpu.geom import bvh as bvh_mod
from lidar_brdf_tpu.geom.intersect import intersect_brute
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.kernels.traverse_pallas import (CAND_BLOCK, LANES,
                                                    PallasCulledTraverser)


def _fan_rays(n_side=16):
    o0 = np.array([0.0, 9.0, 0.0], np.float32)
    az = np.linspace(0, 2 * np.pi, n_side, endpoint=False)
    el = np.linspace(-1.2, -0.2, n_side)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(ee) * np.cos(aa), np.sin(ee),
                  np.cos(ee) * np.sin(aa)], -1).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return np.broadcast_to(o0, d.shape).copy(), d


def test_pallas_culled_matches_brute(rng):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()
    tr = PallasCulledTraverser(scene, tile_rays=LANES, interpret=True)
    data = tr.prepare(tree, o, d, t_max=500.0)
    hit = tr(jnp.asarray(o), jnp.asarray(d), data)
    brute = intersect_brute(scene, jnp.asarray(o), jnp.asarray(d))
    hc = np.asarray(hit.face) >= 0
    hb = np.asarray(brute.face) >= 0
    assert (hc == hb).all()
    np.testing.assert_allclose(np.asarray(hit.t)[hc],
                               np.asarray(brute.t)[hb],
                               rtol=1e-4, atol=1e-4)


def test_pallas_t_max_cut(rng):
    # hits beyond the declared t_max are misses (documented contract)
    verts = np.array([[-1, -1, 50], [1, -1, 50], [0, 1, 50]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    scene = synthetic.scene_from_arrays(verts, faces)
    tree = bvh_mod.build_bvh(verts, faces)
    o = np.zeros((LANES, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (LANES, 1))
    tr = PallasCulledTraverser(scene, tile_rays=LANES, interpret=True)
    hit_far = tr(jnp.asarray(o), jnp.asarray(d),
                 tr.prepare(tree, o, d, t_max=100.0))
    assert (np.asarray(hit_far.face) == 0).all()
    hit_near = tr(jnp.asarray(o), jnp.asarray(d),
                  tr.prepare(tree, o, d, t_max=10.0))
    assert (np.asarray(hit_near.face) == -1).all()


def test_pallas_chunked_candidates_match(rng, monkeypatch):
    """Fat buckets split into MAX_CB-block kernel passes (scoped-VMEM cap);
    the nearest-t merge across chunks must equal the unchunked result."""
    import lidar_brdf_tpu.kernels.traverse_pallas as tp
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()
    tr = PallasCulledTraverser(scene, tile_rays=LANES, interpret=True)
    data = tr.prepare(tree, o, d, t_max=500.0)
    assert any(c.shape[1] // CAND_BLOCK > 2 for _, c, _ in data), \
        "scene too sparse to exercise chunking"
    hit_full = tr(jnp.asarray(o), jnp.asarray(d), data)
    monkeypatch.setattr(tp, "MAX_CB", 2)     # force many chunks per bucket
    hit_chunked = tr(jnp.asarray(o), jnp.asarray(d), data)
    np.testing.assert_array_equal(np.asarray(hit_full.face),
                                  np.asarray(hit_chunked.face))
    np.testing.assert_allclose(np.asarray(hit_full.t),
                               np.asarray(hit_chunked.t), rtol=1e-6)


def test_pallas_tile_rays_must_align():
    scene = synthetic.terrain_with_boxes(np.random.default_rng(0), num_boxes=1)
    with pytest.raises(ValueError):
        PallasCulledTraverser(scene, tile_rays=100)


def test_simulator_use_pallas_interpret(rng):
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.runtime.simulate import Simulator
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 9.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
        tls_middle_angle_vertical=-45.0,
        tls_resolution_horizontal=32, tls_resolution_vertical=16,
        rays_per_pulse=2, max_returns=1, chunk_pulses=512,
        shading_mode=ShadingMode.MEASURED)
    mats = MaterialLibrary.default().table_at(1064)
    rays = build_rays(cfg, scene)
    cloud_p = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                        use_pallas=True).run(rays)
    cloud_x = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                        use_culled=False).run(rays)
    # same number of valid returns; intensity multisets match
    assert int(np.asarray(cloud_p.mask).sum()) \
        == int(np.asarray(cloud_x.mask).sum())
    ip = np.sort(np.asarray(cloud_p.intensity)[np.asarray(cloud_p.mask)])
    ix = np.sort(np.asarray(cloud_x.intensity)[np.asarray(cloud_x.mask)])
    np.testing.assert_allclose(ip, ix, rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# Per-pulse ladder kernel (kernels/pulse_pallas.py)
# ---------------------------------------------------------------------------

def test_pulse_ladder_matches_brute(rng):
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()                       # 256 rays
    R = 4                                    # -> 64 pulses of 4 rays
    oP = o.reshape(-1, R, 3)
    dP = d.reshape(-1, R, 3)
    tr = PulseLadderTraverser(scene, rays_per_pulse=R, interpret=True)
    data = tr.prepare(tree, o, d, t_max=500.0)
    hit = tr(jnp.asarray(oP), jnp.asarray(dP), data)
    brute = intersect_brute(scene, jnp.asarray(o), jnp.asarray(d))
    hc = np.asarray(hit.face).reshape(-1) >= 0
    hb = np.asarray(brute.face) >= 0
    assert (hc == hb).all()
    np.testing.assert_allclose(np.asarray(hit.t).reshape(-1)[hc],
                               np.asarray(brute.t)[hb],
                               rtol=1e-4, atol=1e-4)
    # winner faces agree except at edge/corner near-ties, where the Wald
    # and Moller-Trumbore formulations round the shared-edge t differently
    fk = np.asarray(hit.face).reshape(-1)[hc]
    fb = np.asarray(brute.face)[hb]
    tb = np.asarray(brute.t)[hb]
    diff = fk != fb
    if diff.any():
        tk = np.asarray(hit.t).reshape(-1)[hc]
        np.testing.assert_allclose(tk[diff], tb[diff], rtol=1e-3, atol=1e-3)
        assert diff.mean() < 0.05


def test_pulse_ladder_grouped_matches(rng):
    """group>1 shares one ladder across adjacent pulses — results must be
    identical to the per-pulse scheme (the union candidate set is a
    conservative superset for every member ray)."""
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()                       # 256 rays
    R = 4                                    # 64 pulses of 4 rays
    oP = jnp.asarray(o.reshape(-1, R, 3))
    dP = jnp.asarray(d.reshape(-1, R, 3))
    tr1 = PulseLadderTraverser(scene, rays_per_pulse=R, interpret=True)
    hit1 = tr1(oP, dP, tr1.prepare(tree, o, d, t_max=500.0))
    for grp in (2, 4):
        trg = PulseLadderTraverser(scene, rays_per_pulse=R, group=grp,
                                   interpret=True)
        hitg = trg(oP, dP, trg.prepare(tree, o, d, t_max=500.0))
        np.testing.assert_array_equal(np.asarray(hitg.face),
                                      np.asarray(hit1.face))
        m = np.asarray(hit1.face) >= 0
        np.testing.assert_allclose(np.asarray(hitg.t)[m],
                                   np.asarray(hit1.t)[m], rtol=1e-5)


def test_pulse_ladder_grouped_pad_boundary(rng):
    """A group straddling real rays and zero-direction pad rays must cull
    from the real rays only (pads miss; reals keep their hits)."""
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()                       # 256 rays = 64 pulses of 4
    R = 4
    # pad the last 2 pulses the way Simulator._run_slice does
    o2, d2 = o.copy().reshape(-1, R, 3), d.copy().reshape(-1, R, 3)
    o2[-2:] = 1e10
    d2[-2:] = 0.0
    trg = PulseLadderTraverser(scene, rays_per_pulse=R, group=4,
                               interpret=True)
    hitg = trg(jnp.asarray(o2), jnp.asarray(d2),
               trg.prepare(tree, o2, d2, t_max=500.0))
    tr1 = PulseLadderTraverser(scene, rays_per_pulse=R, interpret=True)
    hit1 = tr1(jnp.asarray(o2[:-2]), jnp.asarray(d2[:-2]),
               tr1.prepare(tree, o2[:-2], d2[:-2], t_max=500.0))
    np.testing.assert_array_equal(np.asarray(hitg.face)[-2:], -1)
    np.testing.assert_array_equal(np.asarray(hitg.face)[:-2],
                                  np.asarray(hit1.face))


def test_pulse_ladder_chunked_matches(rng, monkeypatch):
    import lidar_brdf_tpu.kernels.pulse_pallas as pp
    scene = synthetic.rough_terrain(rng, num_tris=20_000, half=30.0)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    # grazing fan: shallow elevations sweep long terrain strips -> fat
    # ladders that exercise the KB chunk loop
    o0 = np.array([0.0, 3.0, 0.0], np.float32)
    az = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    el = np.linspace(-0.25, -0.02, 16)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(ee) * np.cos(aa), np.sin(ee),
                  np.cos(ee) * np.sin(aa)], -1).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(o0, d.shape).copy()
    R = 2
    tr = pp.PulseLadderTraverser(scene, rays_per_pulse=R, interpret=True)
    data = tr.prepare(tree, o, d, t_max=500.0)
    assert any(r.shape[1] > 1 for _, r, _ in data), \
        "scene too sparse to exercise KB chunking"
    hit_full = tr(jnp.asarray(o.reshape(-1, R, 3)),
                  jnp.asarray(d.reshape(-1, R, 3)), data)
    monkeypatch.setattr(pp, "MAX_KB", 1)
    hit_chunked = tr(jnp.asarray(o.reshape(-1, R, 3)),
                     jnp.asarray(d.reshape(-1, R, 3)), data)
    np.testing.assert_array_equal(np.asarray(hit_full.face),
                                  np.asarray(hit_chunked.face))
    np.testing.assert_allclose(np.asarray(hit_full.t),
                               np.asarray(hit_chunked.t), rtol=1e-6)


def test_pulse_ladder_t_max_cut(rng):
    from lidar_brdf_tpu.kernels.pulse_pallas import (LANES,
                                                     PulseLadderTraverser)
    verts = np.array([[-1, -1, 50], [1, -1, 50], [0, 1, 50]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    scene = synthetic.scene_from_arrays(verts, faces)
    tree = bvh_mod.build_bvh(verts, faces)
    o = np.zeros((LANES, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (LANES, 1))
    tr = PulseLadderTraverser(scene, rays_per_pulse=1, interpret=True)
    hit_far = tr(jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
                 tr.prepare(tree, o, d, t_max=100.0))
    assert (np.asarray(hit_far.face) == 0).all()
    hit_near = tr(jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
                  tr.prepare(tree, o, d, t_max=10.0))
    assert (np.asarray(hit_near.face) == -1).all()


def test_simulator_use_pulse_interpret(rng):
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.runtime.simulate import Simulator
    scene = synthetic.terrain_with_boxes(rng, num_boxes=4)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 9.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
        tls_middle_angle_vertical=-45.0,
        tls_resolution_horizontal=32, tls_resolution_vertical=16,
        rays_per_pulse=2, max_returns=2, chunk_pulses=512,
        # shiny-surface error reads per-RAY-INDEX noise rows, which the
        # bucket-contiguous pulse permutation reindexes — disable it so
        # positions are permutation-invariant and comparable as a multiset
        include_shiny_surface_error=False,
        shading_mode=ShadingMode.MEASURED)
    mats = MaterialLibrary.default().table_at(1064)
    rays = build_rays(cfg, scene)
    cloud_p = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                        use_pulse=True).run(rays)
    cloud_x = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                        use_culled=False).run(rays)
    # the pulse path reorders pulses bucket-contiguously for scatter-free
    # traversal (`permute_pulse_ladders`): point order differs, the
    # (x, y, z, intensity) row MULTISET must not (advisor r04: a wrong
    # permutation applied to origins but not directions must fail here)
    assert int(np.asarray(cloud_p.mask).sum()) \
        == int(np.asarray(cloud_x.mask).sum()) > 0

    def rows(cloud):
        m = np.asarray(cloud.mask)
        r = np.concatenate([np.asarray(cloud.position)[m],
                            np.asarray(cloud.intensity)[m][:, None]], axis=1)
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_allclose(rows(cloud_p), rows(cloud_x),
                               rtol=1e-4, atol=1e-5)
