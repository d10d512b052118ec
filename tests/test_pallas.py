"""Pallas packet-traversal kernel: interpreter-mode correctness
(SURVEY.md §4: interpreter-mode Pallas checks on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_brdf_tpu.geom import bvh as bvh_mod
from lidar_brdf_tpu.geom.intersect import intersect_brute
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.kernels.traverse_pallas import (PallasTraverser, TILE,
                                                    vmem_capacity_faces)


@pytest.fixture(scope="module")
def scene_and_tree():
    rng = np.random.default_rng(11)
    scene = synthetic.terrain_with_boxes(rng, num_boxes=10)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    return scene, tree


def _rays(n, spread=30.0):
    xs = np.linspace(-spread, spread, n).astype(np.float32)
    o = np.stack([xs, np.full(n, 50.0), xs * 0.3], -1)
    d = np.tile(np.array([[0.01, -1.0, 0.02]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_oracle(scene_and_tree):
    scene, tree = scene_and_tree
    trav = PallasTraverser(scene, tree, interpret=True)
    o, d = _rays(TILE)      # exactly one tile
    hit = trav(o, d)
    brute = intersect_brute(scene, o, d)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(brute.t),
                               rtol=1e-5, atol=1e-5)
    both = np.asarray(brute.valid)
    agree = np.asarray(hit.face)[both] == np.asarray(brute.face)[both]
    assert agree.mean() > 0.99


def test_pallas_partial_tile_padding(scene_and_tree):
    scene, tree = scene_and_tree
    trav = PallasTraverser(scene, tree, interpret=True)
    o, d = _rays(100)       # forces padding to a full tile
    hit = trav(o, d)
    brute = intersect_brute(scene, o, d)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(brute.t),
                               rtol=1e-5, atol=1e-5)


def test_pallas_rejects_oversized_scene():
    rng = np.random.default_rng(0)
    n = vmem_capacity_faces() + 10
    # fake a big scene without allocating real geometry: check guard only
    scene = synthetic.random_triangles(rng, num_tris=16)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    big_faces = np.zeros((n, 3), np.int32)
    fake = scene.__class__(**{**scene.__dict__, "faces": big_faces})
    with pytest.raises(ValueError):
        PallasTraverser(fake, tree)
