"""Pallas TPU kernel: beam-culled dense intersection.

Device half of the two-phase traversal in `geom/beamcull.py` (host culls
per-tile candidate lists; see that module's docstring).  The XLA version
(`intersect_culled`) streams (rays x candidate-chunk) intermediates through
HBM and pads every tile's candidate list up to a 128-lane chunk; this kernel
keeps the whole tile in VMEM and processes pairs as (8 candidates x 128
rays) register blocks, so

  * candidate padding drops from 128 to 8 per tile,
  * the running (t, face) carry never leaves registers,
  * candidate blocks are sorted near-to-far with a per-block lower distance
    bound in SMEM, and the block loop EXITS EARLY once every ray's current
    best hit is provably closer than anything left — data-dependent work
    saving that lockstep XLA scans cannot express.

Layout rules obeyed (Mosaic): dynamic indexing only on non-tiled leading
dims; all lane/sublane slices static; scalars (bounds) in SMEM.

Replaces the scalar node-walk kernel that could not compile on real TPUs
(dynamic lane indexing); reference semantics still `findBVHCollision-comp`
(`Assets/Shaders/Compute/LiDAR/findBVHCollision-comp.glsl:94-137`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit
from ..geom.intersect import EPSILON

LANES = 128          # rays per lane group
CAND_BLOCK = 8       # candidates per sublane block
INT_MISS = 2 ** 30          # python int: jnp constants must not be closure-captured
# Scoped-VMEM ceiling: the ids block is (1, CB, 8, 128) i32 = CB * 4 KiB,
# double-buffered by Mosaic.  Dense scenes (5M-tri terrain under a wide ALS
# fan) produce buckets with C = 8192 (CB = 1024) whose blocks alone exceed
# the 16 MiB scoped limit — such buckets run as chunked kernel passes whose
# (t, face) results merge by nearest-t.
MAX_CB = 448         # ids 3.5 MiB + rows 0.44 MiB, x2 buffered ~ 8 MiB


def _kernel(bnd_ref, rays_ref, rows_ref, ids_ref, t_ref, f_ref, *,
            t_max: float):
    """One grid program = one ray tile.

    rays_ref: (1, RG, 8, LANES) f32 — [ox oy oz dx dy dz pad pad] sublanes
    rows_ref: (1, CB, 8, 16)   f32 — 8 candidates x Wald row
    ids_ref:  (1, CB, 8, 128)  i32 — candidate face ids (lane-broadcast)
    bnd_ref:  (1, 1, CB)       f32 — SMEM: block lower distance bound
    t_ref/f_ref: (1, RG, 8, LANES)
    """
    n_rg = rays_ref.shape[1]
    n_cb = rows_ref.shape[1]

    for rg in range(n_rg):                      # static unroll over lane grps
        tile = rays_ref[0, rg]                  # (8, LANES)
        ox, oy, oz = tile[0:1], tile[1:2], tile[2:3]
        dx, dy, dz = tile[3:4], tile[4:5], tile[5:6]

        t0 = jnp.full((1, LANES), jnp.float32(t_max))
        f0 = jnp.full((1, LANES), -1, jnp.int32)

        def cond(state):
            cb, t_best, _ = state
            return jnp.logical_and(cb < n_cb,
                                   bnd_ref[0, 0, cb] <= jnp.max(t_best))

        def body(state):
            cb, t_best, f_best = state
            rows = rows_ref[0, cb]              # (8, 16)
            ids = ids_ref[0, cb]                # (8, 128)
            nx, ny, nz = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
            np0 = rows[:, 3:4]
            nux, nuy, nuz = rows[:, 4:5], rows[:, 5:6], rows[:, 6:7]
            du = rows[:, 7:8]
            nvx, nvy, nvz = rows[:, 8:9], rows[:, 9:10], rows[:, 10:11]
            dv = rows[:, 11:12]

            nd = dx * nx + dy * ny + dz * nz            # (8, LANES)
            no = ox * nx + oy * ny + oz * nz
            ok_det = jnp.abs(nd) >= EPSILON
            t = (np0 - no) / jnp.where(ok_det, nd,
                                       jnp.where(nd < 0, -1.0, 1.0))
            u = (ox * nux + oy * nuy + oz * nuz) + du \
                + t * (dx * nux + dy * nuy + dz * nuz)
            v = (ox * nvx + oy * nvy + oz * nvz) + dv \
                + t * (dx * nvx + dy * nvy + dz * nvz)
            ok = (ok_det & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t >= -EPSILON)
                  & (ids >= 0))
            t_m = jnp.where(ok, t, jnp.float32(t_max))
            t_c = jnp.min(t_m, axis=0, keepdims=True)   # (1, LANES)
            f_c = jnp.min(jnp.where(t_m <= t_c, ids, jnp.int32(INT_MISS)),
                          axis=0, keepdims=True)
            better = t_c < t_best
            return (cb + 1,
                    jnp.where(better, t_c, t_best),
                    jnp.where(better, f_c, f_best))

        _, t_best, f_best = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, f0))
        t_ref[0, rg, 0:1, :] = t_best
        f_ref[0, rg, 0:1, :] = f_best


@functools.partial(jax.jit, static_argnames=("t_max", "interpret"))
def _run(bnd, rays_blk, rows_blk, ids_blk, *, t_max, interpret=False):
    B, RG = rays_blk.shape[0], rays_blk.shape[1]
    CB = rows_blk.shape[1]
    out_t, out_f = pl.pallas_call(
        functools.partial(_kernel, t_max=t_max),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, CB), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RG, 8, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, CB, 8, 16), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, CB, 8, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RG, 8, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, RG, 8, LANES), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, RG, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, RG, 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(bnd, rays_blk, rows_blk, ids_blk)
    return out_t[:, :, 0, :], out_f[:, :, 0, :]


class PallasCulledTraverser:
    """Drop-in for `beamcull.CulledTraverser` with the Pallas device half.

    Requires ``tile_rays % 128 == 0``.  ``traverse_data`` is the bucket
    tuple from `build_buckets` (same host culler); candidate Wald rows are
    gathered by XLA outside the kernel (dense per-bucket arrays), the
    kernel does the pair math with early exit.
    """

    def __init__(self, scene, *, tile_rays: int = 640, chunk: int = 8,
                 interpret: bool | None = None):
        from ..geom.beamcull import CulledTraverser, wald_rows_np
        if tile_rays % LANES:
            raise ValueError(f"tile_rays must be a multiple of {LANES}")
        self.tile_rays = tile_rays
        self.chunk = max(chunk, CAND_BLOCK)
        self._host = CulledTraverser(scene, tile_rays=tile_rays,
                                     chunk=self.chunk)
        self.wald = self._host.wald               # (F, 12)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)
        self._leaf_lut = None                     # set by build_buckets

    # host-side culling (delegates; also computes near-distance sort bounds)
    def build_buckets(self, bvh, origin, direction, t_max=None):
        return self._host.build_buckets(bvh, origin, direction, t_max=t_max)

    def beams_ok(self, origin, direction) -> bool:
        return self._host.beams_ok(origin, direction)

    def bucket_bounds(self, bvh, buckets, origin, direction) -> tuple:
        """Per-candidate-block lower distance bounds (B, CB) per bucket.

        Bound: axis-projected near distance of the face AABB minus the tile
        origin radius (conservative: any hit on that face has ray-t >= it).
        Candidates are already near-to-far sorted by the host culler.
        """
        from ..geom.beamcull import tile_beams
        node_face = np.asarray(bvh.node_face)
        is_leaf = node_face >= 0
        fmin = np.zeros((node_face[is_leaf].max() + 1, 3))
        fmax = np.zeros_like(fmin)
        fmin[node_face[is_leaf]] = np.asarray(bvh.node_min)[is_leaf]
        fmax[node_face[is_leaf]] = np.asarray(bvh.node_max)[is_leaf]
        o, d = self._host._pad_np(origin, direction)
        beams = tile_beams(o, d, self.tile_rays)
        out = []
        for tidx, cand in buckets:
            B, C = cand.shape
            safe_t = np.minimum(tidx, beams.center.shape[0] - 1)
            c_t = beams.center[safe_t][:, None, :]       # (B, 1, 3)
            a_t = beams.axis[safe_t][:, None, :]
            r_t = beams.radius[safe_t][:, None]
            fc = np.where(cand[..., None] >= 0,
                          (fmin[np.maximum(cand, 0)]
                           + fmax[np.maximum(cand, 0)]) * 0.5, 0.0)
            he = np.where(cand[..., None] >= 0,
                          (fmax[np.maximum(cand, 0)]
                           - fmin[np.maximum(cand, 0)]) * 0.5, 0.0)
            proj = np.einsum("bci,bi->bc", fc - c_t, a_t[:, 0, :])
            slack = np.einsum("bci,bi->bc", he, np.abs(a_t[:, 0, :]))
            d_near = np.maximum(proj - slack - r_t, 0.0)
            d_near = np.where(cand >= 0, d_near, np.inf)
            CB = C // CAND_BLOCK
            bnd = d_near.reshape(B, CB, CAND_BLOCK).min(axis=2)
            # monotone prefix (sorted input should already satisfy this)
            bnd = np.minimum.accumulate(bnd[:, ::-1], axis=1)[:, ::-1]
            out.append(bnd.astype(np.float32))
        return tuple(out)

    def pack_buckets(self, bvh, buckets, origin, direction,
                     t_max: float) -> tuple:
        """Host prep: (tidx, cand, bnd) per bucket + static t_max."""
        bounds = self.bucket_bounds(bvh, buckets, origin, direction)
        self.t_max = float(t_max)
        return tuple((t, c, b) for (t, c), b in zip(buckets, bounds))

    def prepare(self, bvh, origin, direction, t_max: float | None = None):
        """One-call host prep: traverse_data for `__call__`."""
        buckets = self.build_buckets(bvh, origin, direction, t_max=t_max)
        if t_max is None:
            # conservative bound consistent with the culler's default
            nmin = np.asarray(bvh.node_min)[0]
            nmax = np.asarray(bvh.node_max)[0]
            o = np.asarray(origin, np.float32).reshape(-1, 3)
            far = np.linalg.norm(o - np.clip(o, nmin, nmax), axis=-1).max()
            t_max = float(np.linalg.norm(nmax - nmin) + far + 1.0)
        return self.pack_buckets(bvh, buckets, origin, direction, t_max)

    def __call__(self, origin, direction, traverse_data) -> Hit:
        from ..geom.intersect import BIG
        shape = origin.shape[:-1]
        o = jax.lax.stop_gradient(origin.reshape(-1, 3))
        d = jax.lax.stop_gradient(direction.reshape(-1, 3))
        n_rays = o.shape[0]
        pad = (-n_rays) % self.tile_rays
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        T = o.shape[0] // self.tile_rays
        RG = self.tile_rays // LANES
        # (T, RG, 8, LANES): sublanes 0-2 = origin, 3-5 = direction
        comp = jnp.concatenate(
            [o, d, jnp.zeros((o.shape[0], 2), o.dtype)], axis=1)   # (N, 8)
        rays_blk_all = comp.reshape(T, RG, LANES, 8).transpose(0, 1, 3, 2)

        t_all = jnp.full((T + 1, self.tile_rays), BIG, jnp.float32)
        f_all = jnp.full((T + 1, self.tile_rays), -1, jnp.int32)
        for tidx, cand, bnd in traverse_data:
            tidx_j = jnp.asarray(tidx)
            cand_full = jnp.asarray(cand)
            bnd_full = jnp.asarray(bnd)
            B, C = cand_full.shape
            safe = jnp.minimum(tidx_j, T - 1)
            rays_blk = rays_blk_all[safe]
            t_tile = None
            f_tile = None
            # chunk fat candidate ladders to stay inside scoped VMEM
            for s in range(0, C // CAND_BLOCK, MAX_CB):
                cand_j = cand_full[:, s * CAND_BLOCK:(s + MAX_CB) * CAND_BLOCK]
                CB = cand_j.shape[1] // CAND_BLOCK
                rows = self.wald[jnp.maximum(cand_j, 0)]           # (B, c, 12)
                rows = jnp.where((cand_j >= 0)[..., None], rows, 0.0)
                rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 4)))
                rows_blk = rows.reshape(B, CB, CAND_BLOCK, 16)
                ids_blk = jnp.broadcast_to(
                    cand_j.reshape(B, CB, CAND_BLOCK, 1),
                    (B, CB, CAND_BLOCK, 128))
                t_b, f_b = _run(bnd_full[:, None, s:s + CB],
                                rays_blk, rows_blk,
                                ids_blk, t_max=self.t_max,
                                interpret=self.interpret)
                t_c = t_b.reshape(B, self.tile_rays)
                f_c = f_b.reshape(B, self.tile_rays)
                if t_tile is None:
                    t_tile, f_tile = t_c, f_c
                else:      # merge chunk results by nearest t (misses = t_max)
                    better = t_c < t_tile
                    t_tile = jnp.where(better, t_c, t_tile)
                    f_tile = jnp.where(better, f_c, f_tile)
            # kernel reports t_max for misses; normalize to (BIG, -1)
            miss = f_tile < 0
            t_tile = jnp.where(miss, BIG, t_tile)
            t_all = t_all.at[tidx_j].set(t_tile, mode="drop")
            f_all = f_all.at[tidx_j].set(f_tile, mode="drop")
        t = t_all[:T].reshape(-1)[:n_rays].reshape(shape)
        f = f_all[:T].reshape(-1)[:n_rays].reshape(shape)
        return Hit(t=t, face=f)
