"""Pallas TPU kernel: packet BVH traversal.

Each grid program owns one tile of TILE rays laid out (8, 128) — a full VPU
register shape — and walks the threaded BVH with its own scalar control flow
(`lax.while_loop` with the node pointer in a scalar), so unlike the XLA
packet path there is no lockstep across tiles: short tiles finish early and
the pipeline moves on.  Node and triangle tables live fully in VMEM.

Data layout (component-major so VMEM lane padding stays cheap — a (N, k)
row layout would pad k up to 128 lanes):
  node_box:  (8, N)  f32  [min.xyz max.xyz unused unused]
  node_meta: (8, N)  i32  [skip, face, ...padding rows]
  tris:      (16, F) f32  [v0 e1 e2 ...pad]
  rays:      (n_tiles, 8, 8, 128) f32  [ox oy oz dx dy dz pad pad]
  out:       t (n_tiles, 8, 128) f32;  face (n_tiles, 8, 128) i32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BVH, Hit, TriangleScene
from ..geom.intersect import BIG, EPSILON

TILE = 8 * 128            # rays per grid program
SUB, LANE = 8, 128

# node_box (8,N)*4B + node_meta (8,N)*4B + tris (16,F)*4B
#   ~= (2*F)*64B + F*64B = 192B per face
VMEM_NODE_BUDGET_BYTES = 10 * 1024 * 1024


def vmem_capacity_faces() -> int:
    """Max faces whose packed nodes+tris fit the VMEM budget."""
    return VMEM_NODE_BUDGET_BYTES // 192


def _traverse_kernel(box_ref, meta_ref, tris_ref, rays_ref, t_ref, face_ref):
    n_nodes = meta_ref.shape[1]

    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0, -1e-12, 1e-12), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def cond(state):
        node, _, _ = state
        return node < n_nodes

    def body(state):
        node, t_best, face_best = state
        bminx = box_ref[0, node]
        bminy = box_ref[1, node]
        bminz = box_ref[2, node]
        bmaxx = box_ref[3, node]
        bmaxy = box_ref[4, node]
        bmaxz = box_ref[5, node]
        skip_i = meta_ref[0, node]
        face_i = meta_ref[1, node]

        tx0 = (bminx - ox) * ix
        tx1 = (bmaxx - ox) * ix
        ty0 = (bminy - oy) * iy
        ty1 = (bmaxy - oy) * iy
        tz0 = (bminz - oz) * iz
        tz1 = (bmaxz - oz) * iz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
        hit_ray = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)
        any_hit = jnp.any(hit_ray)
        is_leaf = face_i >= 0

        def leaf_case(t_best, face_best):
            tri = jnp.maximum(face_i, 0)
            v0x = tris_ref[0, tri]
            v0y = tris_ref[1, tri]
            v0z = tris_ref[2, tri]
            e1x = tris_ref[3, tri]
            e1y = tris_ref[4, tri]
            e1z = tris_ref[5, tri]
            e2x = tris_ref[6, tri]
            e2y = tris_ref[7, tri]
            e2z = tris_ref[8, tri]
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < EPSILON,
                                jnp.where(a < 0, -1.0, 1.0), a)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            ok = ((jnp.abs(a) >= EPSILON) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t >= -EPSILON)
                  & (t < t_best))
            t_new = jnp.where(ok, t, t_best)
            f_new = jnp.where(ok, face_i, face_best)
            return t_new, f_new

        do_leaf = is_leaf & any_hit
        t_best, face_best = jax.lax.cond(
            do_leaf, leaf_case, lambda a, b: (a, b), t_best, face_best)

        descend = any_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, node + 1, skip_i)
        return nxt, t_best, face_best

    t0 = jnp.full((SUB, LANE), 3.4e38, jnp.float32)
    f0 = jnp.full((SUB, LANE), -1, jnp.int32)
    _, t_best, face_best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, f0))
    t_ref[0] = t_best
    face_ref[0] = face_best


def pack_bvh_cm(bvh: BVH) -> tuple[np.ndarray, np.ndarray]:
    """Component-major node arrays: box (8,N) f32, meta (8,N) i32."""
    n = bvh.num_nodes
    box = np.zeros((8, n), np.float32)
    box[0:3] = np.asarray(bvh.node_min).T
    box[3:6] = np.asarray(bvh.node_max).T
    meta = np.zeros((8, n), np.int32)
    meta[0] = np.asarray(bvh.node_skip)
    meta[1] = np.asarray(bvh.node_face)
    return box, meta


def pack_tris_cm(scene: TriangleScene) -> np.ndarray:
    v = np.asarray(scene.vertices, np.float32)
    f = np.asarray(scene.faces)
    v0 = v[f[:, 0]]
    rows = np.zeros((16, len(f)), np.float32)
    rows[0:3] = v0.T
    rows[3:6] = (v[f[:, 1]] - v0).T
    rows[6:9] = (v[f[:, 2]] - v0).T
    return rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse_pallas(box, meta, tris, rays_tiled, *, interpret=False):
    n_tiles = rays_tiled.shape[0]
    out_t, out_f = pl.pallas_call(
        _traverse_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(box.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(meta.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(box, meta, tris, rays_tiled)
    return out_t, out_f


class PallasTraverser:
    """Bind a scene; callable traverse(origin, direction) -> Hit."""

    def __init__(self, scene: TriangleScene, bvh: BVH, *, interpret=False):
        if scene.num_faces > vmem_capacity_faces():
            raise ValueError(
                f"scene too large for VMEM-resident Pallas traversal "
                f"({scene.num_faces} > {vmem_capacity_faces()} faces)")
        box, meta = pack_bvh_cm(bvh)
        self.box = jnp.asarray(box)
        self.meta = jnp.asarray(meta)
        self.tris = jnp.asarray(pack_tris_cm(scene))
        self.interpret = interpret

    def __call__(self, origin, direction) -> Hit:
        shape = origin.shape[:-1]
        o = jax.lax.stop_gradient(origin.reshape(-1, 3))
        d = jax.lax.stop_gradient(direction.reshape(-1, 3))
        n_rays = o.shape[0]
        pad = (-n_rays) % TILE
        if pad:
            o = jnp.concatenate([o, jnp.full((pad, 3), 1e10, o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        n_tiles = o.shape[0] // TILE
        rt = jnp.concatenate(
            [o, d, jnp.zeros((o.shape[0], 2), o.dtype)], axis=1)  # (R, 8)
        rt = rt.reshape(n_tiles, SUB, LANE, 8).transpose(0, 3, 1, 2)
        t, f = _traverse_pallas(self.box, self.meta, self.tris, rt,
                                interpret=self.interpret)
        t = t.reshape(-1)[:n_rays]
        f = f.reshape(-1)[:n_rays]
        return Hit(t=t.reshape(shape), face=f.reshape(shape))
