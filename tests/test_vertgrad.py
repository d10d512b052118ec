"""Scatter-free vertex-gradient path (geom/vertgrad.py) vs the stock
gather-transpose: gradients must match to float tolerance."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidar_brdf_tpu.api import attach_face_neighbors, build_scene_bvh
from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig, ShadingMode)
from lidar_brdf_tpu.geom.vertgrad import build_vertex_grad_aux
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.kernels.pulse_pallas import (PulseLadderTraverser,
                                                 build_pulse_ladders)
from lidar_brdf_tpu.physics.returns import SimScalars
from lidar_brdf_tpu.runtime.simulate import simulate_chunk
from lidar_brdf_tpu.utils import noise as noise_mod


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(11)
    scene = synthetic.rough_terrain(rng, num_tris=8000, half=60.0)
    scene = attach_face_neighbors(scene)
    bvh = build_scene_bvh(scene)
    P, R = 256, 4
    o = np.tile(np.array([[0.0, 50.0, 0.0]], np.float32), (P * R, 1))
    th = rng.uniform(-0.5, 0.5, P)
    ph = rng.uniform(-0.5, 0.5, P)
    d = np.stack([np.sin(th), -np.cos(th) * np.cos(ph), np.sin(ph)], -1)
    d = np.repeat(d, R, axis=0) + rng.normal(0, 2e-3, (P * R, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)

    tr = PulseLadderTraverser(scene, rays_per_pulse=R, interpret=True)
    t_max = tr._resolve_t_max(bvh, o.reshape(-1, 3), None)
    raw = build_pulse_ladders(bvh, o, d, R, t_max=t_max)
    perm, data = tr.pack_permuted(raw, P)
    aux = build_vertex_grad_aux(np.asarray(scene.faces), raw, P,
                                int(scene.vertices.shape[0]))
    o_p = o.reshape(P, R, 3)[perm]
    d_p = d.reshape(P, R, 3)[perm]

    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        rays_per_pulse=R, max_returns=2, chunk_pulses=P,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=True, max_range=400.0)
    materials = MaterialLibrary.default().table_at(1064)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    scalars = SimScalars.from_config(cfg, 0.0)

    from lidar_brdf_tpu.core.types import RayBundle
    rays = RayBundle(origin=jnp.asarray(o_p), direction=jnp.asarray(d_p),
                     gps_time=jnp.zeros(P, jnp.float32))
    return (scene, bvh, cfg, rays, materials, scalars, noise, tr, data, aux)


def _loss(verts, origin, scene, bvh, materials, rays, noise, scalars, cfg,
          tr, data, aux):
    scene = scene.__class__(**{**scene.__dict__, "vertices": verts})
    rays = rays.__class__(origin=origin, direction=rays.direction,
                          gps_time=rays.gps_time)
    cloud = simulate_chunk(scene, bvh, materials, rays, noise, scalars,
                           cfg, scene_has_water=False, traverse_fn=tr,
                           traverse_data=data, vertex_grad_aux=aux)
    return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))


def test_union_backward_matches_stock(workload):
    (scene, bvh, cfg, rays, materials, scalars, noise, tr, data,
     aux) = workload
    args = (scene, bvh, materials, rays, noise, scalars, cfg, tr, data)
    g_stock = jax.grad(_loss, argnums=(0, 1))(
        scene.vertices, rays.origin, *args[:-3], *args[-3:], None)
    g_union = jax.grad(_loss, argnums=(0, 1))(
        scene.vertices, rays.origin, *args[:-3], *args[-3:], aux)
    gv_s, go_s = jax.tree.map(np.asarray, g_stock)
    gv_u, go_u = jax.tree.map(np.asarray, g_union)
    assert np.all(np.isfinite(gv_u)) and np.all(np.isfinite(go_u))
    assert np.abs(gv_s).max() > 0            # the test actually exercises it
    scale = np.abs(gv_s).max()
    np.testing.assert_allclose(gv_u, gv_s, atol=2e-4 * scale, rtol=2e-3)
    np.testing.assert_allclose(go_u, go_s, atol=1e-5, rtol=1e-5)


def test_union_forward_identical(workload):
    (scene, bvh, cfg, rays, materials, scalars, noise, tr, data,
     aux) = workload
    args = (scene, bvh, materials, rays, noise, scalars, cfg, tr, data)
    l0 = _loss(scene.vertices, rays.origin, *args, None)
    l1 = _loss(scene.vertices, rays.origin, *args, aux)
    assert float(l0) == float(l1)


def test_aux_unions_cover_winners(workload):
    """Every face a pulse's ladder offers must have all 3 vertex ids in
    its 128-pulse block's union list."""
    (scene, bvh, cfg, rays, materials, scalars, noise, tr, data,
     aux) = workload
    faces = np.asarray(scene.faces)
    uvert = np.asarray(aux.uvert)
    # reconstruct per-block candidate faces from the packed ladders
    from lidar_brdf_tpu.kernels.pulse_pallas import LANES
    start = 0
    for (s, B, B_pad), (rows_blk, ids_blk) in zip(tr.layout, data):
        ids = np.asarray(ids_blk)            # (NB, KB, 8, 128)
        NB = ids.shape[0]
        for nb in range(NB):
            for lane in range(LANES):
                p = start + nb * LANES + lane
                if p >= start + B:
                    continue
                cand = ids[nb, :, :, lane].reshape(-1)
                cand = cand[cand >= 0]
                blk = p // 128
                union = set(uvert[blk].tolist())
                for f in cand:
                    for v in faces[f]:
                        assert int(v) in union
        start += B
