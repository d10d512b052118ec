"""BVH build + traversal correctness vs brute-force oracle (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from conftest import make_random_scene
from lidar_brdf_tpu.geom import bvh as bvh_mod
from lidar_brdf_tpu.geom import morton
from lidar_brdf_tpu.geom.intersect import intersect_brute, intersect_bvh
from lidar_brdf_tpu.io import synthetic


def test_morton_np_jnp_parity(rng):
    pts = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    np_codes = morton.morton3d_np(pts, lo, hi)
    j_codes = np.asarray(morton.morton3d_jnp(jnp.asarray(pts),
                                             jnp.asarray(lo), jnp.asarray(hi)))
    assert (np_codes == j_codes).all()


def test_morton_locality():
    # Points nearby in space should share morton prefixes.
    a = morton.morton3d_np(np.array([[0.1, 0.1, 0.1]]), np.zeros(3), np.ones(3))
    b = morton.morton3d_np(np.array([[0.9, 0.9, 0.9]]), np.zeros(3), np.ones(3))
    assert a[0] < b[0]


def test_bvh_structure(rng):
    scene = make_random_scene(rng, num_tris=257)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))
    assert tree.num_nodes == 2 * 257 - 1
    bvh_mod.validate_bvh(tree, np.asarray(scene.vertices), np.asarray(scene.faces))


def test_bvh_single_triangle():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    tree = bvh_mod.build_bvh(verts, faces)
    scene = synthetic.scene_from_arrays(verts, faces)
    origin = jnp.array([[0.2, 0.2, -1.0]])
    direction = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect_bvh(scene, tree, origin, direction)
    assert int(hit.face[0]) == 0
    assert abs(float(hit.t[0]) - 1.0) < 1e-5


def _random_rays(rng, n, spread=10.0):
    origin = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    target = rng.uniform(-spread / 4, spread / 4, (n, 3)).astype(np.float32)
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(d)


def test_bvh_matches_brute_force(rng):
    scene = make_random_scene(rng, num_tris=200)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))
    origin, direction = _random_rays(rng, 512)
    brute = intersect_brute(scene, origin, direction)
    fast = intersect_bvh(scene, tree, origin, direction)
    # Face ids can differ when two faces are equidistant; compare distances.
    np.testing.assert_allclose(np.asarray(fast.t), np.asarray(brute.t),
                               rtol=1e-5, atol=1e-5)
    hit_agree = np.asarray(fast.valid) == np.asarray(brute.valid)
    assert hit_agree.all()
    # Where hits exist, face choice should almost always agree too.
    both = np.asarray(fast.valid)
    agree = (np.asarray(fast.face)[both] == np.asarray(brute.face)[both])
    assert agree.mean() > 0.99


def test_bvh_terrain_scene(rng):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))
    bvh_mod.validate_bvh(tree, np.asarray(scene.vertices), np.asarray(scene.faces))
    # Rays straight down from above must hit something (ground everywhere).
    n = 128
    xs = np.linspace(-30, 30, n)
    origin = jnp.asarray(np.stack([xs, np.full(n, 50.0), xs * 0.5], -1),
                         dtype=jnp.float32)
    direction = jnp.tile(jnp.array([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    hit = intersect_bvh(scene, tree, origin, direction)
    assert bool(hit.valid.all())
    brute = intersect_brute(scene, origin, direction)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(brute.t),
                               rtol=1e-5, atol=1e-5)


def test_miss_returns_invalid(rng):
    scene = make_random_scene(rng, num_tris=16, spread=2.0)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))
    origin = jnp.array([[100.0, 100.0, 100.0]])
    direction = jnp.array([[1.0, 0.0, 0.0]])
    hit = intersect_bvh(scene, tree, origin, direction)
    assert int(hit.face[0]) == -1
    assert not bool(hit.valid[0])
