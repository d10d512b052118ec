"""Pallas TPU kernel: per-PULSE candidate-ladder intersection.

Third traversal scheme, built for dense scenes scanned by structured pulses
(the ALS 5M-triangle terrain of BASELINE config 4, where the tile scheme
collapses — see below).  Reference semantics are still one nearest-hit BVH
query per ray (`findBVHCollision-comp.glsl:94-137`); the TPU re-design
replaces the per-ray stack walk with dense pair math against a *per-pulse*
candidate list:

* `geom/beamcull.py` tiles 640 rays into one beam, so every ray pays for
  the whole tile's footprint.  On a 5M-triangle terrain an ALS tile's
  ground footprint covers ~3k triangles -> 3k Wald tests per ray, and the
  bucket arrays rebuilt per step move GBs through HBM (measured 0.31M
  rays/s on v5e).
* A single *pulse* (the supersampling disc of `rays_per_pulse` rays,
  `addPulseRadius`, RayBuilder.cpp:31-53) subtends a far narrower cone;
  its footprint holds ~30-60 triangles.  Culling per pulse cuts the pair
  work ~50x and the ladders are small enough to PRE-PACK on the host:
  the hot loop reads static arrays from HBM and does arithmetic only —
  no gathers, no broadcasts, no per-step bucket rebuilds.

Data layout (per power-of-two ladder size K, pulses padded to 128):

  rows (NB, KB, 12, 8, 128) f32   Wald row component c of candidate
                                  (kb*8+s) for pulse lane l
  ids  (NB, KB, 8, 128)     i32   face ids, -1 = padding
  rays (NB, R, 8, 128)      f32   sublanes [ox oy oz dx dy dz 0 0] per ray

One grid program = 128 pulses: a static unrolled loop over the R rays of
the pulse sits inside a fori over KB candidate blocks; every op is a full
(8, 128) VPU tile.  Winner (t, face) per ray stays in registers.

Mosaic layout rules obeyed: dynamic indexing only on untiled leading dims,
lane/sublane slices static, f32/i32 (8, 128) tiles throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.types import BVH, Hit, TriangleScene
from ..geom.intersect import BIG, EPSILON

LANES = 128         # pulses per grid program
CAND_BLOCK = 8      # candidates per sublane block
INT_MISS = 2 ** 30
# VMEM ceiling per grid step: rows block = KB * 6.5 KiB (+ids KB * 4 KiB),
# double-buffered; KB=64 keeps a pass under ~1.5 MiB so fat ladders chunk.
MAX_KB = 64


def _kernel(rays_ref, rows_ref, ids_ref, t_ref, f_ref, *,
            t_max: float, n_rays: int):
    """One grid program = 128 pulses x R rays x KB candidate blocks."""
    n_kb = rows_ref.shape[1]

    comps = []
    for r in range(n_rays):
        tile = rays_ref[0, r]                       # (8, LANES)
        comps.append((tile[0:1], tile[1:2], tile[2:3],
                      tile[3:4], tile[4:5], tile[5:6]))

    def body(kb, carry):
        rows = rows_ref[0, kb]                      # (12, 8, LANES)
        ids = ids_ref[0, kb]                        # (8, LANES)
        nx, ny, nz, np0 = rows[0], rows[1], rows[2], rows[3]
        nux, nuy, nuz, du = rows[4], rows[5], rows[6], rows[7]
        nvx, nvy, nvz, dv = rows[8], rows[9], rows[10], rows[11]
        ok_id = ids >= 0
        out = []
        for r in range(n_rays):
            ox, oy, oz, dx, dy, dz = comps[r]
            t_best, f_best = carry[r]
            nd = dx * nx + dy * ny + dz * nz        # (8, LANES)
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
                  & ok_id)
            t_m = jnp.where(ok, t, jnp.float32(t_max))
            t_c = jnp.min(t_m, axis=0, keepdims=True)      # (1, LANES)
            f_c = jnp.min(jnp.where(t_m <= t_c, ids, jnp.int32(INT_MISS)),
                          axis=0, keepdims=True)
            better = t_c < t_best
            out.append((jnp.where(better, t_c, t_best),
                        jnp.where(better, f_c, f_best)))
        return tuple(out)

    init = tuple((jnp.full((1, LANES), jnp.float32(t_max)),
                  jnp.full((1, LANES), -1, jnp.int32))
                 for _ in range(n_rays))
    final = jax.lax.fori_loop(0, n_kb, body, init)
    for r in range(n_rays):
        t_ref[0, r:r + 1, :] = final[r][0]
        f_ref[0, r:r + 1, :] = final[r][1]


@functools.partial(jax.jit, static_argnames=("t_max", "interpret"))
def _run(rays_blk, rows_blk, ids_blk, *, t_max, interpret=False):
    NB, R = rays_blk.shape[0], rays_blk.shape[1]
    KB = rows_blk.shape[1]
    RPAD = -(-R // 8) * 8
    out_t, out_f = pl.pallas_call(
        functools.partial(_kernel, t_max=t_max, n_rays=R),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, R, 8, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, KB, 12, 8, LANES), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, KB, 8, LANES), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RPAD, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, RPAD, LANES), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, RPAD, LANES), jnp.float32),
            jax.ShapeDtypeStruct((NB, RPAD, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rays_blk, rows_blk, ids_blk)
    return out_t, out_f


def build_pulse_ladders(bvh: BVH, origins: np.ndarray, directions: np.ndarray,
                        rays_per_pulse: int, *, t_max: float,
                        pad_to: int = CAND_BLOCK):
    """Host cull: per-pulse candidate lists, bucketed by padded size K.

    Returns a tuple of (pidx (Bp,) int32, cand (Bp, K) int32) buckets with
    K = pad_to * 2^k and Bp a multiple of 128 (padding rows: pidx =
    num_pulses, cand = -1).  Candidates are near-to-far sorted along the
    pulse axis (same contract as `build_bucketed_candidates`).
    """
    from ..geom.beamcull import _collect_candidates, tile_beams
    o = np.asarray(origins, np.float64).reshape(-1, 3)
    d = np.asarray(directions, np.float64).reshape(-1, 3)
    if o.shape[0] % rays_per_pulse:
        raise ValueError("ray count not a multiple of rays_per_pulse")
    beams = tile_beams(o, d, rays_per_pulse)
    num_pulses = beams.center.shape[0]
    tiles, faces_out, counts = _collect_candidates(bvh, beams, t_max)
    offsets = np.zeros(num_pulses + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])

    padded = np.maximum(
        pad_to * (2 ** np.ceil(np.log2(np.maximum(
            (counts + pad_to - 1) // pad_to, 1))).astype(np.int64)),
        pad_to)
    buckets = []
    for size in np.unique(padded[counts > 0]):
        pidx = ((padded == size) & (counts > 0)).nonzero()[0]
        B = pidx.shape[0]
        B_pad = -(-B // LANES) * LANES
        cand = np.full((B_pad, int(size)), -1, np.int32)
        # vectorized ragged fill (a Python per-pulse loop here costs
        # seconds at 1M pulses)
        cnt = counts[pidx].astype(np.int64)
        rows = np.repeat(np.arange(B, dtype=np.int64), cnt)
        ends = np.cumsum(cnt)
        cols = np.arange(ends[-1] if B else 0, dtype=np.int64) \
            - np.repeat(ends - cnt, cnt)
        cand[rows, cols] = faces_out[np.repeat(offsets[pidx], cnt) + cols]
        pidx_arr = np.full(B_pad, num_pulses, np.int32)
        pidx_arr[:B] = pidx
        buckets.append((pidx_arr, cand))
    return tuple(buckets)


class PermutedLayout:
    """Hashable marker carrying a static bucket layout through the
    Simulator's traverse_data plumbing (runtime/simulate.py::run_chunk)."""

    __slots__ = ("layout",)

    def __init__(self, layout):
        self.layout = tuple(layout)

    def __hash__(self):
        return hash(self.layout)

    def __eq__(self, other):
        return (isinstance(other, PermutedLayout)
                and self.layout == other.layout)


def permute_pulse_ladders(buckets, num_pulses: int):
    """Bucket-contiguous pulse permutation for scatter-free traversal.

    ``build_pulse_ladders`` buckets pulses by padded candidate-count K, so
    a bucket's ``pidx`` rows are arbitrary pulse ids and the traverser must
    SCATTER its results back to pulse order — and TPU scatter is serialized
    at ~64 ns/row (144 ms/step for the two 1M-row t/f set-scatters on the
    ALS config, scripts/step_profile.py).  Reordering the pulses ON THE
    HOST so each bucket owns a contiguous range turns both the result
    scatter and the ray-component gather into slices/concats.

    Returns ``(perm, layout)``: ``perm`` (num_pulses,) int64 — new pulse i
    is old pulse ``perm[i]``, zero-candidate pulses at the tail — and
    ``layout`` a tuple of ``(start, B, B_pad)`` per bucket (B real pulses
    at [start, start+B) in the new order; blocks padded to B_pad lanes).
    Callers permute the ray bundle with ``perm`` and drop the buckets'
    ``pidx`` arrays.
    """
    import numpy as np
    perm_parts, layout, start = [], [], 0
    for pidx, _ in buckets:
        B = int((pidx < num_pulses).sum())      # real rows come first
        perm_parts.append(pidx[:B].astype(np.int64))
        layout.append((start, B, int(pidx.shape[0])))
        start += B
    covered = (np.concatenate(perm_parts) if perm_parts
               else np.zeros(0, np.int64))
    miss = np.ones(num_pulses, bool)
    miss[covered] = False
    perm = np.concatenate([covered, np.nonzero(miss)[0].astype(np.int64)])
    return perm, tuple(layout)


class PulseLadderTraverser:
    """Beam-culled traversal with per-pulse ladders, pre-packed for TPU.

    Same traverse_fn interface as `CulledTraverser`/`PallasCulledTraverser`:

        tr = PulseLadderTraverser(scene, rays_per_pulse=10)
        data = tr.prepare(bvh, origins, directions, t_max=...)   # host, once
        hits = tr(origin, direction, data)                       # per step

    ``prepare`` culls each pulse's bounding cone against the BVH (narrow
    cones -> near-minimal candidate sets) and packs Wald rows + face ids
    into the kernel's block layout as DEVICE-RESIDENT constants; the
    per-step work is pure arithmetic.  Bounce continuation rays stay on the
    level-0 lines, so the same ladders serve every return level (water
    refraction re-traverses via the packet fallback, as with the tile
    scheme — `physics/returns.py`).
    """

    def __init__(self, scene: TriangleScene, rays_per_pulse: int, *,
                 group: int = 1, interpret: bool | None = None):
        from ..geom.beamcull import wald_rows_np
        self.rays_per_pulse = int(rays_per_pulse)
        # ``group`` adjacent pulses share ONE candidate ladder.  Adjacent
        # pulses in a scan line (or a BSP-ordered block) see nearly the
        # same triangles, so the union ladder grows far slower than x group
        # while the Wald-row HBM footprint shrinks by ~x group — the
        # row-duplication cost this file's header describes.  group=1 is
        # the exact per-pulse scheme.
        self.group = int(group)
        self.wald_np = wald_rows_np(np.asarray(scene.vertices),
                                    np.asarray(scene.faces))
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)
        self.t_max = None
        # bucket-contiguous layout (see `permute_pulse_ladders`): when set,
        # `__call__` expects rays in the permuted pulse order and
        # traverse_data WITHOUT pidx arrays — results come back via
        # slice+concat instead of the serialized TPU scatter
        self.layout = None

    @property
    def kernel_rays(self) -> int:
        """Rays per ladder entity (= per kernel lane)."""
        return self.rays_per_pulse * self.group

    def beams_ok(self, origin, direction) -> bool:
        """Per-group cones narrow enough for culling to pay off (same
        MIN_COS_HALF contract as the tile culler)."""
        from ..geom.beamcull import beams_are_narrow, tile_beams
        o = np.asarray(origin, np.float32).reshape(-1, 3)
        d = np.asarray(direction, np.float32).reshape(-1, 3)
        return beams_are_narrow(tile_beams(o, d, self.kernel_rays))

    def _resolve_t_max(self, bvh: BVH, o: np.ndarray,
                       t_max: float | None) -> float:
        if t_max is None:
            nmin = np.asarray(bvh.node_min)[0]
            nmax = np.asarray(bvh.node_max)[0]
            far = np.linalg.norm(o - np.clip(o, nmin, nmax), axis=-1).max()
            t_max = float(np.linalg.norm(nmax - nmin) + far + 1.0)
        self.t_max = float(t_max)
        return self.t_max

    def _pack_bucket(self, pidx: np.ndarray, cand: np.ndarray):
        """Wald rows + ids in the kernel's block layout (numpy, host)."""
        B_pad, K = cand.shape
        NB, KB = B_pad // LANES, K // CAND_BLOCK
        rows = self.wald_np[np.maximum(cand, 0)].astype(np.float32)
        rows[cand < 0] = 0.0                           # pad rows: n.d == 0
        rows_blk = np.ascontiguousarray(
            rows.reshape(NB, LANES, KB, CAND_BLOCK, 12)
                .transpose(0, 2, 4, 3, 1))             # (NB, KB, 12, 8, 128)
        ids_blk = np.ascontiguousarray(
            cand.reshape(NB, LANES, KB, CAND_BLOCK)
                .transpose(0, 2, 3, 1))                # (NB, KB, 8, 128)
        return pidx, rows_blk, ids_blk

    def prepare(self, bvh: BVH, origin, direction,
                t_max: float | None = None):
        o = np.asarray(origin, np.float32).reshape(-1, 3)
        d = np.asarray(direction, np.float32).reshape(-1, 3)
        t_max = self._resolve_t_max(bvh, o, t_max)
        buckets = build_pulse_ladders(
            bvh, o, d, self.kernel_rays, t_max=t_max)
        return tuple(tuple(jnp.asarray(a) for a in self._pack_bucket(p, c))
                     for p, c in buckets)

    def pack_permuted(self, buckets, num_pulses: int):
        """Pack raw ``build_pulse_ladders`` buckets for the scatter-free
        bucket-contiguous mode.  Sets ``self.layout`` and returns
        ``(perm, traverse_data)``; the caller must reorder its pulses by
        ``perm`` before calling the traverser."""
        perm, layout = permute_pulse_ladders(buckets, num_pulses)
        self.layout = layout
        data = tuple(
            tuple(jnp.asarray(a) for a in self._pack_bucket(p, c)[1:])
            for p, c in buckets)
        return perm, data

    def _call_permuted(self, origin, direction, traverse_data) -> Hit:
        R = self.kernel_rays
        shape = origin.shape[:-1]
        o = jax.lax.stop_gradient(origin.reshape(-1, R, 3))
        d = jax.lax.stop_gradient(direction.reshape(-1, R, 3))
        P = o.shape[0]
        comp = jnp.concatenate(
            [o, d, jnp.zeros((P, R, 2), o.dtype)], axis=-1)   # (P, R, 8)
        t_parts, f_parts = [], []
        covered = 0
        for (start, B, B_pad), (rows_blk, ids_blk) in zip(self.layout,
                                                          traverse_data):
            comp_b = jax.lax.slice_in_dim(comp, start, start + B)
            if B_pad > B:
                comp_b = jnp.pad(comp_b,
                                 ((0, B_pad - B), (0, 0), (0, 0)))
            NB, KB = rows_blk.shape[0], rows_blk.shape[1]
            rays_blk = comp_b.reshape(NB, LANES, R, 8) \
                             .transpose(0, 2, 3, 1)           # (NB, R, 8, 128)
            t_p = None
            f_p = None
            for s in range(0, KB, MAX_KB):                    # fat ladders
                t_b, f_b = _run(rays_blk, rows_blk[:, s:s + MAX_KB],
                                ids_blk[:, s:s + MAX_KB],
                                t_max=self.t_max, interpret=self.interpret)
                t_c = t_b.transpose(0, 2, 1).reshape(B_pad, -1)[:, :R]
                f_c = f_b.transpose(0, 2, 1).reshape(B_pad, -1)[:, :R]
                if t_p is None:
                    t_p, f_p = t_c, f_c
                else:
                    better = t_c < t_p
                    t_p = jnp.where(better, t_c, t_p)
                    f_p = jnp.where(better, f_c, f_p)
            miss = f_p < 0
            t_parts.append(jnp.where(miss, BIG, t_p)[:B])
            f_parts.append(f_p[:B])
            covered += B
        if covered < P:     # zero-candidate pulses live at the tail
            t_parts.append(jnp.full((P - covered, R), BIG, jnp.float32))
            f_parts.append(jnp.full((P - covered, R), -1, jnp.int32))
        t = jnp.concatenate(t_parts).reshape(shape)
        f = jnp.concatenate(f_parts).reshape(shape)
        return Hit(t=t, face=f)

    def prepare_sharded(self, bvh: BVH, origin, direction, n_shards: int,
                        t_max: float | None = None):
        """Per-shard ladders, stacked on a leading device axis.

        Pulses split evenly over ``n_shards``; each shard's ladders are
        built against its local rays (pulse ids are shard-local).  Shards
        can produce different ladder sizes, so every shard is normalized to
        the union ladder — a shard missing a size K gets an all-padding
        bucket — and padded to common bucket row counts.  Returns the same
        pytree shape as :meth:`prepare` with every leaf gaining a leading
        ``(n_shards,)`` axis, ready to shard with ``P(ray_axis)`` on axis 0
        (shard_map then sees exactly one :meth:`prepare` result per device).
        """
        R = self.kernel_rays
        o = np.asarray(origin, np.float32).reshape(-1, 3)
        d = np.asarray(direction, np.float32).reshape(-1, 3)
        t_max = self._resolve_t_max(bvh, o, t_max)
        num_pulses = o.shape[0] // R
        if num_pulses % n_shards:
            raise ValueError(
                f"{num_pulses} pulses not divisible by {n_shards} shards")
        per = num_pulses // n_shards
        shard_buckets = []
        for s in range(n_shards):
            sl = slice(s * per * R, (s + 1) * per * R)
            shard_buckets.append({
                cand.shape[1]: (pidx, cand)
                for pidx, cand in build_pulse_ladders(
                    bvh, o[sl], d[sl], R, t_max=t_max)})
        out = []
        for K in sorted({k for sb in shard_buckets for k in sb}):
            B_pad = max((sb[K][0].shape[0] for sb in shard_buckets if K in sb),
                        default=LANES)
            pidx_all = np.full((n_shards, B_pad), per, np.int32)
            rows_all = np.zeros(
                (n_shards, B_pad // LANES, K // CAND_BLOCK, 12, CAND_BLOCK,
                 LANES), np.float32)
            ids_all = np.full(
                (n_shards, B_pad // LANES, K // CAND_BLOCK, CAND_BLOCK,
                 LANES), -1, np.int32)
            for s, sb in enumerate(shard_buckets):
                if K not in sb:
                    continue
                pidx, cand = sb[K]
                B = pidx.shape[0]
                if B < B_pad:       # pad to the union bucket row count
                    pidx = np.concatenate(
                        [pidx, np.full(B_pad - B, per, np.int32)])
                    cand = np.concatenate(
                        [cand, np.full((B_pad - B, K), -1, np.int32)])
                _, rows_blk, ids_blk = self._pack_bucket(pidx, cand)
                pidx_all[s], rows_all[s], ids_all[s] = pidx, rows_blk, ids_blk
            out.append((jnp.asarray(pidx_all), jnp.asarray(rows_all),
                        jnp.asarray(ids_all)))
        return tuple(out)

    def __call__(self, origin, direction, traverse_data) -> Hit:
        if self.layout is not None:
            return self._call_permuted(origin, direction, traverse_data)
        R = self.kernel_rays
        shape = origin.shape[:-1]
        o = jax.lax.stop_gradient(origin.reshape(-1, R, 3))
        d = jax.lax.stop_gradient(direction.reshape(-1, R, 3))
        P = o.shape[0]
        comp = jnp.concatenate(
            [o, d, jnp.zeros((P, R, 2), o.dtype)], axis=-1)   # (P, R, 8)

        t_all = jnp.full((P + 1, R), BIG, jnp.float32)
        f_all = jnp.full((P + 1, R), -1, jnp.int32)
        for pidx, rows_blk, ids_blk in traverse_data:
            B_pad = pidx.shape[0]
            NB, KB = rows_blk.shape[0], rows_blk.shape[1]
            safe = jnp.minimum(pidx, P - 1)
            rays_blk = comp[safe].reshape(NB, LANES, R, 8) \
                           .transpose(0, 2, 3, 1)             # (NB, R, 8, 128)
            t_p = None
            f_p = None
            for s in range(0, KB, MAX_KB):                    # fat ladders
                t_b, f_b = _run(rays_blk, rows_blk[:, s:s + MAX_KB],
                                ids_blk[:, s:s + MAX_KB],
                                t_max=self.t_max, interpret=self.interpret)
                t_c = t_b.transpose(0, 2, 1).reshape(B_pad, -1)[:, :R]
                f_c = f_b.transpose(0, 2, 1).reshape(B_pad, -1)[:, :R]
                if t_p is None:
                    t_p, f_p = t_c, f_c
                else:
                    better = t_c < t_p
                    t_p = jnp.where(better, t_c, t_p)
                    f_p = jnp.where(better, f_c, f_p)
            miss = f_p < 0
            t_p = jnp.where(miss, BIG, t_p)
            t_all = t_all.at[pidx].set(t_p, mode="drop")
            f_all = f_all.at[pidx].set(f_p, mode="drop")
        t = t_all[:P].reshape(shape)
        f = f_all[:P].reshape(shape)
        return Hit(t=t, face=f)
