"""Packet (ray-tile) BVH traversal — the TPU-shaped intersection path.

Per-ray stack traversal (the reference GPU design) maps badly onto TPU: every
step is a per-ray gather and divergent control flow.  Scan rays, however, are
extremely coherent, so we traverse per *tile* of T consecutive rays instead
(classic packet tracing): one shared walk of the threaded tree per tile,
descending when ANY ray in the tile hits the node box.  All per-ray math is
dense (T,)-vector work on the VPU, and the only gathers are a few small row
fetches per tile per step — T times fewer than per-ray traversal.

NOTE: int<->float bitcasts on gathered data inside `lax.while_loop` fault
the TPU runtime (observed as `UNAVAILABLE: TPU device error`), so node
skip/face links live in separate int32 arrays instead of being packed into
float lanes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import BVH, Hit, TriangleScene
from .intersect import BIG, EPSILON

DEFAULT_TILE = 128


class PackedScene(NamedTuple):
    """Traversal-ready arrays (all device-friendly dtypes, no bitcasts)."""

    node_box: jax.Array    # (N, 6) f32 [min.xyz max.xyz]
    node_skip: jax.Array   # (N,)  i32
    node_face: jax.Array   # (N,)  i32 (leaf face id, -1 internal)
    tri_rows: jax.Array    # (F, 9) f32 [v0 e1 e2]


def pack_scene(scene: TriangleScene, bvh: BVH) -> PackedScene:
    """Pure jnp (usable under jit on traced arrays)."""
    v = jnp.asarray(scene.vertices, jnp.float32)
    f = scene.faces
    v0 = v[f[:, 0]]
    tri_rows = jnp.concatenate([v0, v[f[:, 1]] - v0, v[f[:, 2]] - v0], axis=1)
    node_box = jnp.concatenate([jnp.asarray(bvh.node_min, jnp.float32),
                                jnp.asarray(bvh.node_max, jnp.float32)],
                               axis=1)
    return PackedScene(node_box=node_box,
                       node_skip=jnp.asarray(bvh.node_skip, jnp.int32),
                       node_face=jnp.asarray(bvh.node_face, jnp.int32),
                       tri_rows=tri_rows)


# Back-compat helpers (tests / scripts)
def pack_bvh(bvh: BVH):
    return (jnp.concatenate([jnp.asarray(bvh.node_min, jnp.float32),
                             jnp.asarray(bvh.node_max, jnp.float32)], axis=1),
            jnp.asarray(bvh.node_skip, jnp.int32),
            jnp.asarray(bvh.node_face, jnp.int32))


def pack_triangles(scene: TriangleScene) -> jnp.ndarray:
    v = jnp.asarray(scene.vertices, jnp.float32)
    f = scene.faces
    v0 = v[f[:, 0]]
    return jnp.concatenate([v0, v[f[:, 1]] - v0, v[f[:, 2]] - v0], axis=1)


@partial(jax.jit, static_argnames=("tile",))
def intersect_packed_scene(packed: PackedScene, origin, direction, *,
                           tile: int = DEFAULT_TILE) -> Hit:
    """Nearest-hit intersection via packet traversal.

    origin/direction: (..., 3).  Rays are flattened and tiled in order, so
    callers should pass scan-ordered rays (consecutive pulses are spatially
    coherent; BVH leaves are Morton-ordered).
    """
    node_box, node_skip, node_face, tris = packed
    shape = origin.shape[:-1]
    o = jax.lax.stop_gradient(origin.reshape(-1, 3))
    d = jax.lax.stop_gradient(direction.reshape(-1, 3))
    n_rays = o.shape[0]
    pad = (-n_rays) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e10, o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
    n_tiles = o.shape[0] // tile
    o = o.reshape(n_tiles, tile, 3)
    d = d.reshape(n_tiles, tile, 3)
    d_safe = jnp.where(jnp.abs(d) < 1e-12,
                       jnp.where(d < 0, -1e-12, 1e-12), d)
    inv_d = 1.0 / d_safe

    sentinel = jnp.int32(node_box.shape[0])

    def cond(state):
        node, _, _ = state
        return jnp.any(node < sentinel)

    def body(state):
        node, t_best, face_best = state                       # (nt,), (nt,T)
        safe = jnp.minimum(node, sentinel - 1)
        row = node_box[safe]                                  # (nt, 6)
        bmin = row[:, None, 0:3]
        bmax = row[:, None, 3:6]
        skip = node_skip[safe]
        leaf_face = node_face[safe]

        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)        # (nt, T)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit_ray = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)
        active = node < sentinel
        any_hit = hit_ray.any(axis=-1) & active               # (nt,)
        is_leaf = leaf_face >= 0

        trow = tris[jnp.maximum(leaf_face, 0)]                # (nt, 9)
        v0 = trow[:, None, 0:3]
        e1 = trow[:, None, 3:6]
        e2 = trow[:, None, 6:9]
        h = jnp.cross(d, jnp.broadcast_to(e2, d.shape))
        a = jnp.sum(jnp.broadcast_to(e1, d.shape) * h, axis=-1)
        f = 1.0 / jnp.where(jnp.abs(a) < EPSILON,
                            jnp.where(a < 0, -1.0, 1.0), a)
        s = o - v0
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, jnp.broadcast_to(e1, s.shape))
        v = f * jnp.sum(d * q, axis=-1)
        t = f * jnp.sum(jnp.broadcast_to(e2, q.shape) * q, axis=-1)
        ok = ((jnp.abs(a) >= EPSILON) & (u >= 0.0) & (u <= 1.0)
              & (v >= 0.0) & (u + v <= 1.0) & (t >= -EPSILON))
        # A ray missing the node box cannot hit a triangle inside it (pruned
        # rays can only yield t >= t_best), so no per-ray box gate is needed.
        closer = ok & (t < t_best) & (is_leaf & active)[:, None]
        t_best = jnp.where(closer, t, t_best)
        face_best = jnp.where(closer, leaf_face[:, None], face_best)

        descend = any_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(active, nxt, sentinel)
        return nxt, t_best, face_best

    node0 = jnp.zeros(n_tiles, jnp.int32)
    t0_ = jnp.full((n_tiles, tile), BIG, jnp.float32)
    f0 = jnp.full((n_tiles, tile), -1, jnp.int32)
    _, t_best, face_best = jax.lax.while_loop(cond, body, (node0, t0_, f0))
    t_best = jax.lax.stop_gradient(t_best).reshape(-1)[:n_rays]
    face_best = face_best.reshape(-1)[:n_rays]
    return Hit(t=t_best.reshape(shape), face=face_best.reshape(shape))


def intersect_packed(nodes, tris, origin, direction, *,
                     tile: int = DEFAULT_TILE) -> Hit:
    """Compatibility wrapper over `intersect_packed_scene`.

    ``nodes`` is the (box, skip, face) triple from `pack_bvh`.
    """
    node_box, node_skip, node_face = nodes
    packed = PackedScene(node_box=node_box, node_skip=node_skip,
                         node_face=node_face, tri_rows=tris)
    return intersect_packed_scene(packed, origin, direction, tile=tile)


def make_packet_traverser(scene: TriangleScene, bvh: BVH,
                          tile: int = DEFAULT_TILE):
    """Bind packed arrays; returns traverse_fn(origin, direction) -> Hit."""
    packed = pack_scene(scene, bvh)

    def traverse(origin, direction):
        return intersect_packed_scene(packed, origin, direction, tile=tile)

    return traverse
