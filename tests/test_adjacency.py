"""Face-neighbor contiguity table vs the gather formulation."""

import numpy as np
import jax
import pytest

from conftest import make_random_scene
from lidar_brdf_tpu.geom.adjacency import build_face_neighbors


def _brute_neighbors(faces, comp):
    F = faces.shape[0]
    out = []
    for a in range(F):
        row = [b for b in range(F) if b != a and comp[a] == comp[b]
               and len(set(faces[a]) & set(faces[b])) >= 1]
        out.append(sorted(row))
    return out


def test_table_matches_brute_force(rng):
    # welded grid: plenty of shared vertices
    from lidar_brdf_tpu.io import synthetic
    v, f = synthetic.ground_plane(half=5.0, y=0.0, cells=4)
    comp = np.zeros(f.shape[0], np.int64)
    table = build_face_neighbors(f, comp)
    brute = _brute_neighbors(np.asarray(f), comp)
    assert table.shape[0] == f.shape[0]
    for a in range(f.shape[0]):
        got = sorted(int(x) for x in table[a] if x >= 0)
        assert got == brute[a], a


def test_comp_boundary_blocks_contiguity():
    # two faces sharing an edge but in different components
    faces = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
    comp = np.array([0, 1], np.int64)
    table = build_face_neighbors(faces, comp)
    assert (table < 0).all()
    comp_same = np.zeros(2, np.int64)
    table2 = build_face_neighbors(faces, comp_same)
    assert table2[0, 0] == 1 and table2[1, 0] == 0


def test_cap_returns_none():
    # hub vertex: 100 faces all share vertex 0 -> width 99 > cap
    F = 100
    faces = np.stack([np.zeros(F, np.int64),
                      np.arange(1, F + 1), np.arange(F + 1, 2 * F + 1)], 1)
    assert build_face_neighbors(faces, np.zeros(F, np.int64), cap=8) is None
    t = build_face_neighbors(faces, np.zeros(F, np.int64), cap=128)
    assert t is not None and t.shape == (F, F - 1)


def test_simulate_table_matches_gather(rng):
    """Pipeline output with the table must equal the gather formulation."""
    import jax.numpy as jnp
    from lidar_brdf_tpu.api import (attach_face_neighbors, build_rays,
                                    build_scene_bvh)
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk
    from lidar_brdf_tpu.utils import noise as noise_mod

    scene = synthetic.terrain_with_boxes(rng, num_boxes=5)
    assert scene.face_neighbors is None
    scene_t = attach_face_neighbors(scene)
    assert scene_t.face_neighbors is not None
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 9.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=70.0,
        tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=48, tls_resolution_vertical=12,
        rays_per_pulse=4, max_returns=2, chunk_pulses=576,
        pulse_radius=0.05,             # large footprint: exercises the merge
        shading_mode=ShadingMode.MEASURED)
    rays = build_rays(cfg, scene)
    mats = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    import functools
    jitted = jax.jit(functools.partial(simulate_chunk, cfg=cfg,
                                       scene_has_water=False))
    run = lambda sc: jitted(sc, bvh, mats, rays, noise, scalars)
    a, b = run(scene), run(scene_t)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.num_returns),
                                  np.asarray(b.num_returns))
    np.testing.assert_allclose(np.asarray(a.intensity),
                               np.asarray(b.intensity), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(a.position),
                               np.asarray(b.position), rtol=0, atol=0)
