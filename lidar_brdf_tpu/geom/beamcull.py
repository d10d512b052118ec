"""Beam-culled dense intersection — the TPU speed-of-light traversal path.

The reference finds hits by walking a BVH per GPU thread with a 200-entry
stack (`findBVHCollision-comp.glsl:94-137`).  Scalar pointer-chasing is the
worst possible shape for a TPU, so this module splits traversal in two:

1. HOST, once per ray chunk (`build_tile_candidates`): group coherent rays
   into tiles; bound each tile by a *beam* (origin bounding sphere +
   direction cone); walk the threaded BVH for all tiles at once over a
   vectorized (tile, node) frontier, keeping every leaf whose AABB the beam
   can touch within range.  The test is conservative (never rejects a
   reachable triangle): it minimizes the convex gap
   ``dist(axis(s), box grown by r_o) - s*tan(half_angle)`` over the ray
   parameter ``s`` by ternary search.

2. DEVICE (`intersect_culled`): each ray tile is intersected against its
   padded candidate list as pure dense vector math.  Triangles are held in
   Wald precomputed form (plane + two barycentric planes, 12 floats), which
   makes t, u, v affine in (origin, direction): six batched dot products per
   (ray, candidate) pair, a running masked min over candidate chunks, and no
   gathers or data-dependent control flow anywhere in the hot loop.

Hit semantics match `moller_trumbore` (`geom/intersect.py`): parallel rays
(|n.d| < EPSILON) miss, u, v in [0,1], u+v <= 1, forward hits t >= -EPSILON,
nearest hit wins.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import BVH, Hit, TriangleScene
from .intersect import BIG, EPSILON

DEFAULT_TILE_RAYS = 512
DEFAULT_CHUNK = 128

# A beam wider than this (cos of half-angle) culls nothing useful; callers
# should fall back to packet traversal (see `beams_are_narrow`).
MIN_COS_HALF = 0.5


# ---------------------------------------------------------------------------
# Wald precomputed triangle form
# ---------------------------------------------------------------------------

def wald_rows_np(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """(F, 12) rows [n, n.v0, nu, du, nv, dv] such that for a ray (o, d):

        t = (n.v0 - n.o) / (n.d)
        u = (nu.o + du) + t * (nu.d)
        v = (nv.o + dv) + t * (nv.d)

    Degenerate faces get all-zero rows (n.d == 0 for every ray => no hit).
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    n = np.cross(e1, e2)
    cu = np.cross(e2, n)                      # u-plane direction
    cv = np.cross(e1, n)                      # v-plane direction
    su = np.einsum("ij,ij->i", cu, e1)
    sv = np.einsum("ij,ij->i", cv, e2)
    degen = (np.abs(su) < 1e-30) | (np.abs(sv) < 1e-30)
    su = np.where(degen, 1.0, su)
    sv = np.where(degen, 1.0, sv)
    nu = cu / su[:, None]
    nv = cv / sv[:, None]
    rows = np.concatenate([
        n,
        np.einsum("ij,ij->i", n, v0)[:, None],
        nu, -np.einsum("ij,ij->i", nu, v0)[:, None],
        nv, -np.einsum("ij,ij->i", nv, v0)[:, None],
    ], axis=1)
    rows[degen] = 0.0
    return rows.astype(np.float32)


# ---------------------------------------------------------------------------
# Host-side beam culling
# ---------------------------------------------------------------------------

@dataclass
class TileBeams:
    center: np.ndarray     # (T, 3) origin-sphere center
    radius: np.ndarray     # (T,)   origin-sphere radius
    axis: np.ndarray       # (T, 3) unit cone axis
    cos_half: np.ndarray   # (T,)   cone half-angle cosine
    valid: np.ndarray      # (T,)   tile has >= 1 real ray


def tile_beams(origins: np.ndarray, directions: np.ndarray,
               tile_rays: int) -> TileBeams:
    """Per-tile bounding beams; rays with ~zero direction (padding) ignored."""
    o = np.asarray(origins, np.float64).reshape(-1, tile_rays, 3)
    d = np.asarray(directions, np.float64).reshape(-1, tile_rays, 3)
    dn = np.linalg.norm(d, axis=-1)
    ok = dn > 1e-9
    du = np.where(ok[..., None], d / np.maximum(dn, 1e-30)[..., None], 0.0)
    count = ok.sum(axis=1)
    valid = count > 0
    axis = du.sum(axis=1)
    alen = np.linalg.norm(axis, axis=-1)
    axis = np.where(alen[:, None] > 1e-12, axis / np.maximum(alen, 1e-30)[:, None],
                    np.array([0.0, 1.0, 0.0]))
    cosd = np.einsum("tri,ti->tr", du, axis)
    cos_half = np.where(ok, cosd, 1.0).min(axis=1)
    cos_half = np.clip(cos_half, 1e-3, 1.0)
    big = ~ok[..., None]
    omin = np.where(big, np.inf, o).min(axis=1)
    omax = np.where(big, -np.inf, o).max(axis=1)
    omin = np.where(valid[:, None], omin, 0.0)
    omax = np.where(valid[:, None], omax, 0.0)
    center = (omin + omax) * 0.5
    radius = np.linalg.norm(omax - center, axis=-1)
    return TileBeams(center=center, radius=radius, axis=axis,
                     cos_half=cos_half, valid=valid)


def beams_are_narrow(beams: TileBeams,
                     min_cos_half: float = MIN_COS_HALF) -> bool:
    return bool((beams.cos_half[beams.valid] >= min_cos_half).all())


def bsp_order_np(features: np.ndarray, block: int) -> np.ndarray:
    """Permutation grouping rows into contiguous blocks of ``block`` with
    small extent, by recursive median split along the widest feature axis.

    Unlike Morton ordering this has no code-space discontinuities: every
    block is an actual spatial cluster of the data, so per-block bounding
    beams stay narrow.
    """
    f = np.asarray(features, np.float64)
    n = f.shape[0]
    order = np.arange(n)
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= block:
            continue
        seg = order[lo:hi]
        ext = f[seg].max(axis=0) - f[seg].min(axis=0)
        ax = int(np.argmax(ext))
        # split at a block-multiple so finished blocks are never re-split
        mid = lo + (((hi - lo) // 2 + block - 1) // block) * block
        mid = min(mid, hi - 1)
        k = mid - lo
        part = np.argpartition(f[seg, ax], k)
        order[lo:hi] = seg[part]
        stack.append((lo, mid))
        stack.append((mid, hi))
    return order


def _beam_box_overlap(center, axis, tan_half, radius, bmin, bmax, t_max,
                      iters: int = 24):
    """Conservative beam-vs-AABB test, vectorized over pairs.

    Minimizes the convex g(s) = dist(center + s*axis, box grown by radius)
    - s*tan_half over s in [0, t_max]; overlap iff min <= slack.  A cheap
    slab test against the grown box accepts axis-crossing pairs without the
    ternary search.
    """
    gmin = bmin - radius[:, None]
    gmax = bmax + radius[:, None]

    # fast accept: axis ray passes through the grown box
    inv = 1.0 / np.where(np.abs(axis) < 1e-12,
                         np.where(axis < 0, -1e-12, 1e-12), axis)
    t0 = (gmin - center) * inv
    t1 = (gmax - center) * inv
    t_near = np.minimum(t0, t1).max(axis=1)
    t_far = np.maximum(t0, t1).min(axis=1)
    accept = (t_far >= np.maximum(t_near, 0.0)) & (t_near <= t_max)

    rest = (~accept).nonzero()[0]
    if rest.size:
        c_r, a_r = center[rest], axis[rest]
        gmin_r, gmax_r = gmin[rest], gmax[rest]
        tan_r = tan_half[rest]

        def g(s):
            p = c_r + s[:, None] * a_r
            q = np.clip(p, gmin_r, gmax_r) - p
            return np.sqrt(np.einsum("ij,ij->i", q, q)) - s * tan_r

        lo = np.zeros(rest.shape[0])
        hi = np.full(rest.shape[0], float(t_max))
        for _ in range(iters):
            m1 = lo + (hi - lo) * (1.0 / 3.0)
            m2 = hi - (hi - lo) * (1.0 / 3.0)
            left = g(m1) < g(m2)
            hi = np.where(left, m2, hi)
            lo = np.where(left, lo, m1)
        s = (lo + hi) * 0.5
        slack = 1e-4 + 1e-5 * float(t_max)
        accept[rest] = g(s) <= slack
    return accept


def _collect_candidates(bvh: BVH, beams: TileBeams, t_max: float | None):
    """(tiles, faces, counts): per-tile reachable leaf faces, sorted by
    (tile, near-to-far centroid projection)."""
    node_min = np.asarray(bvh.node_min, np.float64)
    node_max = np.asarray(bvh.node_max, np.float64)
    node_face = np.asarray(bvh.node_face)
    node_skip = np.asarray(bvh.node_skip)
    n_nodes = node_face.shape[0]
    n_tiles = beams.center.shape[0]

    if t_max is None:
        diag = np.linalg.norm(node_max[0] - node_min[0])
        far = np.linalg.norm(
            beams.center - np.clip(beams.center, node_min[0], node_max[0]),
            axis=-1).max() + beams.radius.max()
        t_max = float(diag + far) + 1.0
    tan_half = np.sqrt(np.maximum(1.0 - beams.cos_half ** 2, 0.0)) \
        / beams.cos_half

    # native C++ culler (OpenMP over tiles); numpy frontier as fallback
    if not os.environ.get("LIDAR_BRDF_TPU_NO_NATIVE"):
        from ..io.native import cull_candidates_native
        res = cull_candidates_native(bvh, beams.center, beams.axis, tan_half,
                                     beams.radius, beams.valid, t_max)
        if res is not None:
            tiles, faces_out, _, counts = res
            return tiles, faces_out, counts

    # (tile, node) frontier BFS from the root
    live = beams.valid.nonzero()[0].astype(np.int64)
    pair_t = live
    pair_n = np.zeros(live.shape[0], np.int64)
    out_t: list[np.ndarray] = []
    out_f: list[np.ndarray] = []
    while pair_t.size:
        hit = _beam_box_overlap(
            beams.center[pair_t], beams.axis[pair_t], tan_half[pair_t],
            beams.radius[pair_t], node_min[pair_n], node_max[pair_n], t_max)
        t_in = pair_t[hit]
        n_in = pair_n[hit]
        leaf = node_face[n_in] >= 0
        if leaf.any():
            out_t.append(t_in[leaf])
            out_f.append(node_face[n_in[leaf]].astype(np.int64))
        internal_t = t_in[~leaf]
        internal_n = n_in[~leaf]
        left = internal_n + 1
        right = node_skip[left].astype(np.int64)
        in_range = right < n_nodes
        pair_t = np.concatenate([internal_t, internal_t[in_range]])
        pair_n = np.concatenate([left, right[in_range]])

    if not out_t:
        empty = np.zeros(0, np.int64)
        return empty, empty, np.zeros(n_tiles, np.int64)
    tiles = np.concatenate(out_t)
    faces_out = np.concatenate(out_f)
    # near-to-far ordering within each tile (centroid projection on axis)
    is_leaf = node_face >= 0
    leaf_ids = node_face[is_leaf]
    cent = np.zeros((leaf_ids.max() + 1, 3))
    cent[leaf_ids] = (node_min[is_leaf] + node_max[is_leaf]) * 0.5
    proj = np.einsum("ij,ij->i",
                     cent[faces_out] - beams.center[tiles],
                     beams.axis[tiles])
    order = np.lexsort((proj, tiles))
    tiles = tiles[order]
    faces_out = faces_out[order]
    counts = np.bincount(tiles, minlength=n_tiles)
    return tiles, faces_out, counts


def build_tile_candidates(bvh: BVH, origins: np.ndarray,
                          directions: np.ndarray, *,
                          tile_rays: int = DEFAULT_TILE_RAYS,
                          t_max: float | None = None,
                          pad_to: int = DEFAULT_CHUNK) -> np.ndarray:
    """(n_tiles, C) int32 candidate face ids per ray tile, -1 padded.

    Rays are tiled in flat order — callers should pass coherently ordered
    rays (see `runtime.simulate.bsp_order`).  Ray count must be a multiple
    of ``tile_rays`` (pad with zero-direction rays).  ``t_max`` bounds the
    reachable range (None = conservative scene-diagonal bound).
    """
    o = np.asarray(origins, np.float64).reshape(-1, 3)
    d = np.asarray(directions, np.float64).reshape(-1, 3)
    if o.shape[0] % tile_rays:
        raise ValueError(f"ray count {o.shape[0]} not a multiple of "
                         f"tile_rays={tile_rays}")
    beams = tile_beams(o, d, tile_rays)
    n_tiles = beams.center.shape[0]
    tiles, faces_out, counts = _collect_candidates(bvh, beams, t_max)
    c_max = int(counts.max()) if counts.size else 0
    c_max = max(((c_max + pad_to - 1) // pad_to) * pad_to, pad_to)
    cand = np.full((n_tiles, c_max), -1, np.int32)
    if tiles.size:
        offsets = np.zeros(n_tiles + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        col = np.arange(tiles.shape[0]) - offsets[tiles]
        cand[tiles, col] = faces_out.astype(np.int32)
    return cand


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def build_bucketed_candidates(bvh: BVH, origins: np.ndarray,
                              directions: np.ndarray, *,
                              tile_rays: int = DEFAULT_TILE_RAYS,
                              t_max: float | None = None,
                              pad_to: int = DEFAULT_CHUNK,
                              quantize: bool = True):
    """Candidates grouped into size buckets so padding stays local.

    Returns a tuple of (tile_idx (B,) i32, cand (B, C_b) i32) buckets with
    C_b = pad_to * 2^k.  Tiles with no candidates appear in no bucket.  When
    ``quantize``, bucket tile counts are rounded up to powers of two with
    dummy rows (tile id = n_tiles, cand = -1) so repeated chunks mostly
    reuse compiled shapes.
    """
    o = np.asarray(origins, np.float64).reshape(-1, 3)
    d = np.asarray(directions, np.float64).reshape(-1, 3)
    if o.shape[0] % tile_rays:
        raise ValueError(f"ray count {o.shape[0]} not a multiple of "
                         f"tile_rays={tile_rays}")
    beams = tile_beams(o, d, tile_rays)
    n_tiles = beams.center.shape[0]
    tiles, faces_out, counts = _collect_candidates(bvh, beams, t_max)
    offsets = np.zeros(n_tiles + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])

    padded = np.maximum(
        pad_to * (2 ** np.ceil(np.log2(np.maximum(
            (counts + pad_to - 1) // pad_to, 1))).astype(np.int64)),
        pad_to)
    buckets = []
    for size in np.unique(padded[counts > 0]):
        tidx = ((padded == size) & (counts > 0)).nonzero()[0]
        B = tidx.shape[0]
        B_pad = _next_pow2(B) if quantize else B
        cand = np.full((B_pad, int(size)), -1, np.int32)
        for row, t in enumerate(tidx):
            c = counts[t]
            cand[row, :c] = faces_out[offsets[t]:offsets[t] + c]
        tidx_arr = np.full(B_pad, n_tiles, np.int32)
        tidx_arr[:B] = tidx
        buckets.append((tidx_arr, cand))
    return tuple(buckets)


# ---------------------------------------------------------------------------
# Device-side dense intersection
# ---------------------------------------------------------------------------

def intersect_culled(wald: jax.Array, cand: jax.Array,
                     origin: jax.Array, direction: jax.Array, *,
                     chunk: int = DEFAULT_CHUNK) -> Hit:
    """Nearest hit of tiled rays against per-tile candidate lists.

    wald: (F, 12) triangle rows; cand: (T, C) int32 (-1 pad), C % chunk == 0;
    origin/direction: (T, R, 3).
    """
    T, C = cand.shape
    R = origin.shape[1]
    n_chunks = C // chunk
    rows = wald[jnp.maximum(cand, 0)]                    # (T, C, 12)
    rows = jnp.where((cand >= 0)[..., None], rows, 0.0)  # pad rows -> n.d == 0
    rows_s = rows.reshape(T, n_chunks, chunk, 12).transpose(1, 0, 2, 3)
    ids_s = cand.reshape(T, n_chunks, chunk).transpose(1, 0, 2)

    # NOTE: these contractions must NOT go through jnp.einsum/dot — TPU
    # matmuls truncate f32 inputs to bf16 on the MXU, and the barycentric
    # in/out tests need full f32 (observed: v = -2.6e-4 flipping to a hit).
    # Explicit mul/add keeps everything on the VPU at f32 and fuses anyway.
    def dot3(a, b):                                       # (T,R,3)x(T,c,3)
        return (a[:, :, None, 0] * b[:, None, :, 0]
                + a[:, :, None, 1] * b[:, None, :, 1]
                + a[:, :, None, 2] * b[:, None, :, 2])    # -> (T, R, c)

    def body(carry, xs):
        t_best, f_best = carry                            # (T, R)
        rws, ids = xs                                     # (T, chunk, 12/1)
        n = rws[..., 0:3]
        np0 = rws[..., 3]
        nu = rws[..., 4:7]
        du = rws[..., 7]
        nv = rws[..., 8:11]
        dv = rws[..., 11]
        nd = dot3(direction, n)                           # (T, R, chunk)
        no = dot3(origin, n)
        ok_det = jnp.abs(nd) >= EPSILON
        t = (np0[:, None, :] - no) / jnp.where(
            ok_det, nd, jnp.where(nd < 0, -1.0, 1.0))
        u = dot3(origin, nu) + du[:, None, :] + t * dot3(direction, nu)
        v = dot3(origin, nv) + dv[:, None, :] + t * dot3(direction, nv)
        ok = (ok_det & (ids >= 0)[:, None, :]
              & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= -EPSILON))
        t_m = jnp.where(ok, t, BIG)
        # two plain min-reductions fuse into the elementwise chain (argmin +
        # take_along_axis would materialize the (T, R, chunk) intermediates)
        t_c = jnp.min(t_m, axis=-1)                       # (T, R)
        f_c = jnp.min(jnp.where(t_m <= t_c[..., None],
                                ids[:, None, :], jnp.int32(2 ** 30)), axis=-1)
        better = t_c < t_best
        return (jnp.where(better, t_c, t_best),
                jnp.where(better, f_c, f_best)), None

    t0 = jnp.full((T, R), BIG, jnp.float32)
    f0 = jnp.full((T, R), -1, jnp.int32)
    if n_chunks == 1:
        (t_best, f_best), _ = body((t0, f0), (rows_s[0], ids_s[0]))
    else:
        (t_best, f_best), _ = jax.lax.scan(body, (t0, f0), (rows_s, ids_s))
    return Hit(t=t_best, face=f_best)


# ---------------------------------------------------------------------------
# Bound traverser
# ---------------------------------------------------------------------------

class CulledTraverser:
    """Bind scene geometry; candidates are passed per call (`traverse_data`).

    Usage:
        tr = CulledTraverser(scene, tile_rays=512)
        data = tr.build_candidates(bvh, origins, directions)   # host, per chunk
        hits = tr(origin, direction, data)                     # device

    ``traverse_data`` is either a dense (T, C) candidate array (from
    `build_tile_candidates`) or a tuple of (tile_idx, cand) buckets (from
    `build_bucketed_candidates`).
    """

    def __init__(self, scene: TriangleScene, *,
                 tile_rays: int = DEFAULT_TILE_RAYS,
                 chunk: int = DEFAULT_CHUNK):
        self.tile_rays = tile_rays
        self.chunk = chunk
        self.wald = jnp.asarray(
            wald_rows_np(np.asarray(scene.vertices), np.asarray(scene.faces)))

    def _pad_np(self, origin, direction):
        o = np.asarray(origin, np.float32).reshape(-1, 3)
        d = np.asarray(direction, np.float32).reshape(-1, 3)
        pad = (-o.shape[0]) % self.tile_rays
        if pad:
            o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
            d = np.concatenate([d, np.zeros((pad, 3), np.float32)])
        return o, d

    def build_candidates(self, bvh: BVH, origin, direction,
                         t_max: float | None = None) -> np.ndarray:
        o, d = self._pad_np(origin, direction)
        return build_tile_candidates(bvh, o, d, tile_rays=self.tile_rays,
                                     t_max=t_max, pad_to=self.chunk)

    def build_buckets(self, bvh: BVH, origin, direction,
                      t_max: float | None = None):
        o, d = self._pad_np(origin, direction)
        return build_bucketed_candidates(
            bvh, o, d, tile_rays=self.tile_rays, t_max=t_max,
            pad_to=self.chunk)

    def beams_ok(self, origin, direction) -> bool:
        o, d = self._pad_np(origin, direction)
        return beams_are_narrow(tile_beams(o, d, self.tile_rays))

    def prepare(self, bvh: BVH, origin, direction,
                t_max: float | None = None):
        """One-call host prep: traverse_data for `__call__` (bucket tuple)."""
        return self.build_buckets(bvh, origin, direction, t_max=t_max)

    def __call__(self, origin, direction, traverse_data) -> Hit:
        shape = origin.shape[:-1]
        o = jax.lax.stop_gradient(origin.reshape(-1, 3))
        d = jax.lax.stop_gradient(direction.reshape(-1, 3))
        n_rays = o.shape[0]
        pad = (-n_rays) % self.tile_rays
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        T = o.shape[0] // self.tile_rays
        o_t = o.reshape(T, self.tile_rays, 3)
        d_t = d.reshape(T, self.tile_rays, 3)
        if isinstance(traverse_data, tuple):
            t_all = jnp.full((T + 1, self.tile_rays), BIG, jnp.float32)
            f_all = jnp.full((T + 1, self.tile_rays), -1, jnp.int32)
            for tidx, cand in traverse_data:
                tidx = jnp.asarray(tidx)
                safe = jnp.minimum(tidx, T - 1)
                hit = intersect_culled(
                    self.wald, jnp.asarray(cand), o_t[safe], d_t[safe],
                    chunk=min(self.chunk, cand.shape[1]))
                t_all = t_all.at[tidx].set(hit.t, mode="drop")
                f_all = f_all.at[tidx].set(hit.face, mode="drop")
            t_best, f_best = t_all[:T], f_all[:T]
        else:
            cand = jnp.asarray(traverse_data)
            if cand.shape[0] != T:
                raise ValueError(f"candidates built for {cand.shape[0]} "
                                 f"tiles, rays give {T}")
            hit = intersect_culled(self.wald, cand, o_t, d_t,
                                   chunk=min(self.chunk, cand.shape[1]))
            t_best, f_best = hit.t, hit.face
        t = t_best.reshape(-1)[:n_rays].reshape(shape)
        f = f_best.reshape(-1)[:n_rays].reshape(shape)
        return Hit(t=t, face=f)
