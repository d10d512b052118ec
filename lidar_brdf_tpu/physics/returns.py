"""Pulse reduction and multi-return extraction.

This is the TPU-first re-design of the reference's per-return GPU loop
(`LiDARSimulation::solveRayIntersection` cpp:455-618 driving
`findBVHCollision` -> `reduceCollisions` -> `addOutlier` kernels, with a CPU
counter readback per iteration).  Here the whole thing is one jitted
`lax.scan` over return levels with dense (pulses,) slots and validity masks —
no atomics, no host round-trips.

Semantics reproduced from `reduceCollisions-comp.glsl`:
  * per-pulse nearest-hit winner among raysPulse beam samples   (:186-199)
  * footprint merge radius 2*d*pulseRadius*(2-|cos|), same-face and
    contiguous-triangle merging                                  (:201-223)
  * scan angle, corrected distance, gps time += 2d/c             (:225-233)
  * validation: noisy max-range cut, per-return loss probability from
    shininess, water single-bounce rule                          (:132-151)
  * shiny-surface and terrain-induced displacement errors        (:98-130)
  * next-bounce state: refraction through water, returnNumber++  (:152-170)
plus `addOutlier-comp.glsl` atmospheric outliers and
`updateReturns-comp.glsl` return-count stamping.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.config import SensorConfig
from ..core.types import (BVH, MaterialTable, RayBundle, SURFACE_TERRAIN,
                          SURFACE_WATER, TriangleScene)
from ..geom.intersect import (BIG, face_normal_from_verts,
                              intersect_bvh, refine_hit, refine_hit_verts)
from ..utils import noise as noise_mod
from ..utils.safemath import safe_arccos, safe_norm, safe_sqrt, safe_unit
from .types import ReturnRecord, OutlierRecord

_pytree = jax.tree_util.register_dataclass

LIGHT_SPEED = 299792458.0
PI = jnp.float32(3.1415926535)

# Error-model weights (`reduceCollisions-comp.glsl:11-19`)
HORIZONTAL_TERRAIN_ERROR_W = 1.0 / 1000.0
VERTICAL_TERRAIN_ERROR_HEIGHT_W = 1e-4
VERTICAL_TERRAIN_ERROR_ANGLE_W = 0.5
SHINY_DISTANCE_WEIGHT = 1.0 / 200.0
SHINY_MODEL_WEIGHT = 1.0 / 80.0
SHINY_INDIVIDUAL_ERROR = 1.0 / 100.0

# Decorrelates outlier noise draws across return levels: the reference
# indexes outlier noise by position in the per-level compacted collision
# buffer (`addOutlier-comp.glsl:41,45` uses `index`, which restarts per
# level), so a pulse never re-draws the same outlier at every level.  Our
# dense slots reproduce that by mixing the level into the stream row.
OUTLIER_LEVEL_STRIDE = 1_299_721       # prime >> any chunk's pulse count


@_pytree
@dataclass
class SimScalars:
    """Dynamic (differentiable / sweepable) scalar parameters."""

    peak_power: jax.Array
    pulse_radius: jax.Array
    max_range: jax.Array
    max_range_boundary: jax.Array      # (2,)
    loss_mult: jax.Array
    loss_add: jax.Array
    loss_power: jax.Array
    loss_threshold: jax.Array
    reflectance_weight: jax.Array
    sensor_diameter: jax.Array
    system_attenuation: jax.Array
    atmospheric_attenuation: jax.Array
    water_height: jax.Array
    outlier_threshold: jax.Array
    outlier_range: jax.Array           # (2,)

    @staticmethod
    def from_config(cfg: SensorConfig, scene_min_y: float = 0.0) -> "SimScalars":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return SimScalars(
            peak_power=f(cfg.peak_power),
            pulse_radius=f(cfg.pulse_radius),
            max_range=f(cfg.max_range),
            max_range_boundary=f(cfg.max_range_soft_boundary),
            loss_mult=f(cfg.loss_mult_coefficient),
            loss_add=f(cfg.loss_add_coefficient),
            loss_power=f(cfg.loss_power),
            loss_threshold=f(cfg.loss_threshold),
            reflectance_weight=f(cfg.reflectance_weight),
            sensor_diameter=f(cfg.sensor_diameter),
            system_attenuation=f(cfg.system_attenuation),
            atmospheric_attenuation=f(cfg.atmospheric_attenuation(scene_min_y)),
            water_height=f(cfg.water_height),
            outlier_threshold=f(cfg.outlier_threshold),
            outlier_range=f(cfg.outlier_range),
        )


# gradient-safe variants (see utils/safemath.py): dense masked slots hit
# zero vectors and |cos|=1 boundaries, whose infinite true derivatives
# would poison the whole gradient through 0*NaN
_norm = safe_norm
_unit = safe_unit


def _refract(I, N, eta):
    """GLSL refract(I, N, eta) (used by `computeRayDirection`, :64-73)."""
    cosi = jnp.sum(N * I, axis=-1, keepdims=True)
    k = 1.0 - eta[..., None] ** 2 * (1.0 - cosi ** 2)
    refr = eta[..., None] * I - (eta[..., None] * cosi + safe_sqrt(k)) * N
    return jnp.where(k < 0.0, jnp.zeros_like(refr), refr)


# Packed per-face row layout (`build_face_pack`): float32 columns
#   0:3 v0   3:6 v1   6:9 v2
#   9:11 uv0  11:13 uv1  13:15 uv2
#   15 ks  16 ns  17 refractive index  18 roughness  19 comp noise draw
#   20 comp id  21 material id  22 surface flags   (ints, exact in f32)
# The facet normal is NOT stored: it is recomputed per winner from the
# vertex columns (`face_normal_from_verts`), which keeps geometry
# gradients P-sized and saves 3 columns of HBM.
FACE_PACK_WIDTH = 23


def build_face_pack(scene: TriangleScene, materials: MaterialTable,
                    noise_buf: jax.Array) -> jax.Array:
    """One fat float row per face: every per-winner lookup in one gather.

    TPU gathers cost per ROW, not per byte, so the ~12 separate per-pulse
    row gathers the return loop would otherwise issue (3 vertices + normal
    for `refine_hit`, face->comp, comp->material/surface, vertex ks/ns,
    3 uv rows, material refraction/roughness, the per-component noise draw)
    collapse into ONE (P, 23) gather of this table.  Construction itself
    costs ~10 F-row gathers, but it depends only on (scene, materials,
    noise) — XLA hoists it out of training loops, and chunked runs reuse it
    across chunks — so it amortizes whenever faces < pulses simulated.

    Int columns are stored as exact f32 (ids < 2^24).  Gradients flow
    through the vertex/uv/ks/material columns to the underlying arrays.
    """
    f = scene.faces
    vert_ksns = jnp.stack([scene.vertex_ks, scene.vertex_ns], axis=1)
    comp_aug = jnp.stack([scene.comp_material, scene.comp_surface], axis=1)
    crow = comp_aug[scene.face_comp]                              # (F, 2)
    mat_aug = jnp.stack([materials.refractive_index, materials.roughness],
                        axis=1)
    mrow = mat_aug[crow[:, 0]]                                    # (F, 2)
    comp_rand = noise_mod.stream_sample(
        noise_buf, scene.face_comp.astype(jnp.uint32),
        noise_mod.MODEL_COMP_STREAM)
    fl = jnp.float32
    return jnp.concatenate([
        scene.vertices[f[:, 0]], scene.vertices[f[:, 1]],
        scene.vertices[f[:, 2]],
        scene.vertex_uv[f[:, 0]], scene.vertex_uv[f[:, 1]],
        scene.vertex_uv[f[:, 2]],
        vert_ksns[f[:, 0]], mrow, comp_rand[:, None].astype(fl),
        scene.face_comp[:, None].astype(fl), crow.astype(fl),
    ], axis=1)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _winner_rows(spec, cat, flat_w):
    """cat[flat_w] with a transpose that KNOWS the indices are unique.

    Exactly one winner row per pulse, so the backward scatter-add has no
    collisions; the stock gather transpose assumes colliding indices and
    lowers to the slow serializing scatter.  ``spec`` = (shape, dtype) of
    ``cat`` (static)."""
    return cat[flat_w]


def _winner_rows_fwd(spec, cat, flat_w):
    return cat[flat_w], flat_w


def _winner_rows_bwd(spec, flat_w, g):
    shape, dtype = spec
    d_cat = jnp.zeros(shape, dtype).at[flat_w].add(
        g.astype(dtype), unique_indices=True, mode="promise_in_bounds")
    return d_cat, None


_winner_rows.defvjp(_winner_rows_fwd, _winner_rows_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _winner_rows_pr(R, cat, w):
    """``cat`` (P*R, C) gathered at flat rows ``p*R + w[..., p]``.

    ``w`` holds the per-pulse winner ray index (in [0, R)); any leading axes
    (e.g. the return-level axis) are carried through: result shape
    ``w.shape + (C,)``.

    Backward expands the cotangent DENSELY over the R-sized ray axis with a
    compare-select (one (P, R, C) masked sum, ~1 ms at the 1M-pulse ALS
    shape) instead of the stock gather transpose, whose scatter-add is
    SERIALIZED on TPU at ~64 ns/row — 91 ms per 1M-row scatter, 182 ms/step
    for the 2-level cat6 pack (measured v5e, scripts/step_profile.py)."""
    P = w.shape[-1]
    flat = (jnp.arange(P, dtype=jnp.int32) * R
            + w.astype(jnp.int32)).reshape(-1)
    return cat[flat].reshape(w.shape + (cat.shape[-1],))


def _winner_rows_pr_fwd(R, cat, w):
    return _winner_rows_pr(R, cat, w), w


def _winner_rows_pr_bwd(R, w, g):
    P = w.shape[-1]
    C = g.shape[-1]
    wl = w.reshape(-1, P)                                    # (L, P)
    gl = g.reshape(-1, P, C)                                 # (L, P, C)
    r = jnp.arange(R, dtype=wl.dtype)
    mask = wl[:, :, None] == r[None, None, :]                # (L, P, R)
    d_cat = jnp.sum(
        jnp.where(mask[..., None], gl[:, :, None, :], 0.0),
        axis=0)                                              # (P, R, C)
    return d_cat.reshape(P * R, C).astype(g.dtype), None


_winner_rows_pr.defvjp(_winner_rows_pr_fwd, _winner_rows_pr_bwd)


@jax.custom_vjp
def _winner_verts_union(verts, vidx, has_winner, aux):
    """``verts[vidx]`` with a scatter-free backward (geom/vertgrad.py).

    ``vidx`` (L, P, 3) winner-corner vertex ids; ``aux`` a `VertexGradAux`
    whose per-block (``aux.block_pulses`` pulses) union lists are
    guaranteed (by the beam-cull candidate construction) to contain every
    id a block's WINNERS can take.  ``has_winner`` (L, P) marks real
    winners; the backward zeroes the cotangent of no-winner face-0
    fallback rows EXPLICITLY (advisor r04) — so a loss that reads
    unmasked record fields still gets the documented "fallback rows
    contribute no vertex gradient" semantics rather than silently-dropped
    face-0 contributions.  Backward: dense one-hot accumulate onto the
    static union slots, then a host-precomputed sort permutation + cumsum
    + boundary difference lands the dense (V, 3) gradient with zero TPU
    scatters (the stock gather transpose serializes at ~64 ns/row:
    380 ms/step at the ALS BASELINE shape; this path measures ~10x
    cheaper)."""
    return verts[vidx]


def _winner_verts_union_fwd(verts, vidx, has_winner, aux):
    return verts[vidx], (vidx, has_winner, aux, verts.shape[0])


def _winner_verts_union_bwd(res, g):
    vidx, has_winner, aux, V = res
    g = jnp.where(has_winner[..., None, None], g, 0.0)
    L, P, _ = vidx.shape
    BP = aux.block_pulses
    NB = P // BP
    E = L * BP * 3                                 # winner-corner entries
    wc = jnp.transpose(vidx.reshape(L, NB, BP * 3),
                       (1, 0, 2)).reshape(NB, E)   # (NB, E)
    gb = jnp.transpose(g.reshape(L, NB, BP * 3, 3),
                       (1, 0, 2, 3)).reshape(NB, E, 3)
    # 1) dense one-hot accumulate: broadcast compare fused into the reduce
    # (keep it out of dot_general — a materialized one-hot would be ~25 GB)
    mask = aux.uvert[:, :, None] == wc[:, None, :]           # (NB, U, E)
    d_u = jnp.sum(jnp.where(mask[..., None], gb[:, None, :, :], 0.0),
                  axis=2)                                    # (NB, U, 3)
    # 2) static segment-sum: sort by vertex id (host-precomputed perm),
    # exclusive cumsum, boundary difference
    rows = d_u.reshape(-1, 3)[aux.perm]                      # (NB*U, 3)
    csum = jnp.concatenate(
        [jnp.zeros((1, 3), rows.dtype), jnp.cumsum(rows, axis=0)])
    d_verts = csum[aux.bounds[1:]] - csum[aux.bounds[:-1]]   # (V, 3)
    return d_verts.astype(g.dtype), None, None, None


_winner_verts_union.defvjp(_winner_verts_union_fwd, _winner_verts_union_bwd)


def _faces_contiguous(va, vb, comp_a, comp_b):
    """Same component and sharing >= 1 vertex (`areTriangleContiguous`).

    ``va``/``vb`` are pre-gathered (..., 3) vertex-index rows — callers fuse
    this gather with the per-face component lookup (one (F, 4) row gather
    instead of two separate ones; TPU gathers are priced per row)."""
    shared = (va[..., :, None] == vb[..., None, :]).any(axis=(-1, -2))
    return (comp_a == comp_b) & shared


def simulate_returns(
    scene: TriangleScene,
    bvh: BVH,
    materials: MaterialTable,
    rays: RayBundle,
    noise_buf: jax.Array,
    scalars: SimScalars,
    cfg: SensorConfig,
    *,
    base_ray_index: jax.Array | int = 0,
    traverse_fn=None,
    traverse_data=None,
    scene_has_water: bool = True,
    face_pack: jax.Array | bool | None = None,
    vertex_grad_aux=None,
) -> tuple[ReturnRecord, OutlierRecord, jax.Array, jax.Array]:
    """Run the per-return extraction loop for one chunk of pulses.

    Returns (records stacked over return levels, outlier records,
    num_returns per pulse, final ray origins).  All shapes static; invalid
    slots masked.  ``scene_has_water`` must be passed statically when jitted
    (a water hit refracts continuing rays even without bathymetric mode —
    `computeRayDirection`, `reduceCollisions-comp.glsl:64-73` — so the
    single-traversal fast path needs a water-free scene).
    """
    if traverse_fn is None:
        # Packet traversal is the TPU-shaped default; the per-ray lockstep
        # path (`intersect_bvh`) remains available for testing.
        from ..geom.packet import intersect_packed_scene, pack_scene
        packed = pack_scene(scene, bvh)
        traverse_fn = lambda o, d: intersect_packed_scene(packed, o, d)

    P, R = rays.num_pulses, rays.rays_per_pulse
    max_returns = cfg.max_returns
    bathymetric = bool(cfg.bathymetric)
    retraverse = bathymetric or scene_has_water
    bounce_traverse_fn = traverse_fn
    if traverse_data is not None:
        base_traverse = traverse_fn
        traverse_fn = lambda o, d: base_traverse(o, d, traverse_data)
        if retraverse:
            # Hybrid: the beam-culled candidates cover the level-0 rays the
            # host saw; refracted bounce rays (water) re-traverse the full
            # tree with the packet walk.
            from ..geom.packet import intersect_packed_scene, pack_scene
            packed = pack_scene(scene, bvh)
            bounce_traverse_fn = \
                lambda o, d: intersect_packed_scene(packed, o, d)

    start_point = rays.origin                      # (P, R, 3) fixed sensor origin
    ray_power = scalars.peak_power / jnp.float32(R)
    base_ray_index = jnp.asarray(base_ray_index, jnp.uint32)
    ray_gidx = (base_ray_index
                + jnp.arange(P * R, dtype=jnp.uint32).reshape(P, R))
    pulse_gidx = base_ray_index // jnp.uint32(max(R, 1)) \
        + jnp.arange(P, dtype=jnp.uint32)

    sensor_normal = (jnp.array([1.0, 0.0, 1.0], jnp.float32)
                     if cfg.is_terrestrial
                     else jnp.array([1.0, 1.0, 0.0], jnp.float32))

    # Level 0 always uses the primary traversal (beam-culled when
    # candidates were supplied); only refracted bounce levels re-traverse.
    hits0 = traverse_fn(rays.origin, rays.direction)

    # Fused lookup rows — TPU gathers are priced per row.  Preferred: ONE
    # packed (F, 26) face row (`build_face_pack`) gathered once per level.
    # Auto-gate: packing pays when the construction (~10 F-row gathers —
    # loop-hoistable only while the scene is NOT being differentiated/
    # updated) is smaller than the ~10 P-row per-level gathers it replaces:
    # F-row build vs P·L-row savings, so the break-even is F ≈ P·L (the
    # old F ≤ P·R·L gate over-packed by the ray factor and cost 5M-face
    # inverse-geometry steps an F-row rebuild + scatter per step).
    # Pass face_pack=<array> to force, False to disable.
    if face_pack is None:
        if scene.num_faces <= P * max(max_returns, 1):
            face_pack = build_face_pack(scene, materials, noise_buf)
        else:
            face_pack = False
    if face_pack is False:
        face_pack = None
    faces_aug = None
    if face_pack is None or scene.face_neighbors is None:
        #   faces_aug (F, 4): [v0, v1, v2, comp]
        faces_aug = jnp.concatenate(
            [scene.faces, scene.face_comp[:, None]], axis=1)
    if face_pack is None:
        #   comp_aug  (C, 2): [material, surface]
        #   vert_ksns (V, 2): [ks, ns]
        #   mat_aug   (M, 2): [refractive_index, roughness]
        comp_aug = jnp.stack([scene.comp_material, scene.comp_surface],
                             axis=1)
        vert_ksns = jnp.stack([scene.vertex_ks, scene.vertex_ns], axis=1)
        mat_aug = jnp.stack([materials.refractive_index,
                             materials.roughness], axis=1)

    N = P * R
    start2 = rays.origin.reshape(N, 3)
    ray_gidx2 = ray_gidx.reshape(N)
    # helpers: per-pulse -> per-ray broadcast in FLAT form
    rep = lambda x: jnp.broadcast_to(x[:, None], (P, R)).reshape(N)
    repv = lambda x: jnp.broadcast_to(
        x[:, None, :], (P, R, x.shape[-1])).reshape(N, x.shape[-1])

    if not retraverse:
        # Water-free, non-bathymetric scenes: ray origins/directions never
        # change across return levels, so the whole level loop is DISCRETE
        # (winner picks, footprint merges, validity) — run it gradient-
        # opaque, then recompute every differentiable record field once,
        # vectorized over (levels x pulses).  See _returns_noretraverse.
        return _returns_noretraverse(
            scene, materials, rays, noise_buf, scalars, cfg, hits0,
            face_pack, faces_aug, base_ray_index, sensor_normal,
            vertex_grad_aux=vertex_grad_aux)

    def step(state, hits):
        # Per-ray state lives FLAT (N = P*R rows): lax.scan stacks the
        # carry per level as backward residuals, and XLA lays (L, P, R, k)
        # stacks out with the R=rays axis on the 128-lane dim — a measured
        # 12.8x HBM expansion at 10 rays/pulse (a 1M-pulse 2-return
        # backward needed 39 GB).  Flat (L, N, k) stacks keep the long
        # axis minor and store dense.  (P, R)-shaped masks are formed
        # transiently for the per-pulse reductions only.
        (origin2, dir2, prev2, active2, return_count, prev_water,
         prev_point, level) = state

        t2 = hits.t.reshape(N)
        face2 = hits.face.reshape(N)
        valid2 = (face2 >= 0) & active2                             # (N,)
        valid_hit = valid2.reshape(P, R)
        dist = jnp.where(valid_hit, hits.t, BIG)
        w = jnp.argmin(dist, axis=1)                                # (P,)
        # Winner-ray fields: pack per-ray tensors and gather the (P,)
        # winner rows once per dtype instead of once per field.
        flat_w = jnp.arange(P, dtype=jnp.int32) * R + w.astype(jnp.int32)

        def take_rows(*parts):
            cat = jnp.concatenate(
                [p.reshape(N, -1) for p in parts], axis=-1)
            if jnp.issubdtype(cat.dtype, jnp.floating):
                # dense-expand backward (see _winner_rows_pr); int packs
                # carry no gradients so the plain unique-scatter VJP is fine
                return _winner_rows_pr(R, cat, w.astype(jnp.int32))
            return _winner_rows((cat.shape, cat.dtype), cat, flat_w)

        fpack = take_rows(origin2, dir2, start2, prev2)              # (P, 12)
        origin_w = fpack[:, 0:3]
        dir_w = fpack[:, 3:6]
        start_w = fpack[:, 6:9]
        prev_dir_w_raw = fpack[:, 9:12]
        ipack = take_rows(face2, valid2.astype(jnp.int32),
                          ray_gidx2.astype(jnp.int32))              # (P, 3)
        face_w = ipack[:, 0]
        has_winner = ipack[:, 1].astype(bool)
        idx_w = ipack[:, 2].astype(jnp.uint32)
        # Differentiable re-evaluation of the winning hit (fixed topology),
        # plus every co-indexed per-face field — ONE row gather when the
        # packed face table is in play (see `build_face_pack`).
        if face_pack is not None:
            frow = face_pack[jnp.maximum(face_w, 0)]                # (P, 23)
            _, point_w, (u_w, v_w), _ = refine_hit_verts(
                origin_w, dir_w, frow[:, 0:3], frow[:, 3:6],
                frow[:, 6:9], face_w)
            normal_w = face_normal_from_verts(
                frow[:, 0:3], frow[:, 3:6], frow[:, 6:9])
            verts_w = None
            comp_w = frow[:, 20].astype(jnp.int32)
            mat_w = frow[:, 21].astype(jnp.int32)
            surface_w = frow[:, 22].astype(jnp.int32)
        else:
            frow = None
            _, point_w, (u_w, v_w), normal_w, _ = refine_hit(
                scene, origin_w, dir_w, face_w)
            rows_w = faces_aug[jnp.maximum(face_w, 0)]              # (P, 4)
            verts_w = rows_w[:, 0:3]
            comp_w = rows_w[:, 3]
            crow_w = comp_aug[comp_w]                               # (P, 2)
            mat_w = crow_w[:, 0]
            surface_w = crow_w[:, 1]
        # No-winner pulses refine against face 0 with t=BIG (=f32 max):
        # point_w would be ±inf, and although every consumer is masked,
        # inf/inf inside norms turns the MASKED backward cotangents into
        # 0*NaN=NaN and poisons vertex/origin gradients.  Pin those slots
        # to the ray origin (finite, grad-neutral, value-irrelevant).
        point_w = jnp.where(has_winner[:, None], point_w, origin_w)
        is_water = (surface_w & SURFACE_WATER) != 0
        is_terrain = (surface_w & SURFACE_TERRAIN) != 0

        # Per-ray hit points (non-diff; drive discrete merge decisions only).
        point_i2 = origin2 + dir2 * jnp.where(valid2, t2, 0.0)[:, None]

        # -------- footprint merge (`reduceCollisions` :201-223) ----------
        footprint = _norm(point_w - start_w) * scalars.pulse_radius
        cos_inc = jnp.abs(jnp.sum(normal_w * (-_unit(dir_w)), axis=-1))
        allowed = 2.0 * footprint * (2.0 - cos_inc)
        d_to_winner = _norm(point_i2.reshape(P, R, 3)
                            - point_w[:, None, :])
        if scene.face_neighbors is not None:
            # precomputed contiguity (geom/adjacency.py): ONE winner-row
            # gather + dense id compares, instead of a (P, R)-row vertex
            # gather (~7.6 ms at 1.3M rays on v5e)
            cont_w = scene.face_neighbors[jnp.maximum(face_w, 0)]  # (P, MAXN)
            contiguous = (hits.face[:, :, None]
                          == cont_w[:, None, :]).any(axis=-1)
        else:
            rows_i = faces_aug[jnp.maximum(hits.face, 0)]          # (P, R, 4)
            if verts_w is None:        # packed path: winner vertex ids
                verts_w = faces_aug[jnp.maximum(face_w, 0)][:, 0:3]
            contiguous = _faces_contiguous(
                rows_i[..., 0:3], verts_w[:, None, :],
                rows_i[..., 3], comp_w[:, None])
        same = (valid_hit
                & ((d_to_winner < allowed[:, None])
                   | (hits.face == face_w[:, None])
                   | contiguous))
        same = same & has_winner[:, None]
        num_intersected = jnp.sum(same, axis=1).astype(jnp.int32)
        continue_ray = valid_hit & ~same                            # (P, R)

        # -------- winner record fields (:225-233) -------------------------
        corrected = _norm(point_w - start_w)
        nd = _unit(-dir_w)
        angle = (jnp.clip(safe_arccos(
            jnp.sum(nd * sensor_normal * nd, axis=-1)),
            -PI / 2, PI / 2) / (PI / 2) * 90.0)
        gps = rays.gps_time + corrected * 2.0 / LIGHT_SPEED

        # -------- validation (`validateCollision` :132-151) ---------------
        # all per-winner noise streams in one row gather
        nz = noise_mod.stream_rows(noise_buf, idx_w)                # (P, 16)
        dnoise = nz[:, noise_mod.DISTANCE_STREAM]
        b0, b1 = scalars.max_range_boundary[0], scalars.max_range_boundary[1]
        noisy_max = scalars.max_range + dnoise * (b1 - b0) + b0
        if face_pack is not None:
            ksns = frow[:, 15:17]
            mrow = frow[:, 17:19]
        else:
            ksns = vert_ksns[verts_w[:, 0]]                         # (P, 2)
            mrow = mat_aug[mat_w]                                   # (P, 2)
        shininess = jnp.clip(jnp.power(jnp.maximum(ksns[:, 0], 0.0),
                                       ksns[:, 1])
                             * mrow[:, 1], 0.0, 1.0)
        loss_thr = jnp.where(
            shininess < scalars.loss_threshold, 0.0,
            scalars.loss_mult * jnp.power(
                jnp.maximum(shininess + scalars.loss_add, 0.0),
                scalars.loss_power))
        lost = (nz[:, noise_mod.LOSS_STREAM]
                <= loss_thr) & jnp.logical_not(bathymetric)
        first_return = return_count == 0
        valid_col = (has_winner
                     & (corrected < noisy_max)
                     & (~is_water | first_return)
                     & ~lost)

        # -------- error displacements (:98-130) ---------------------------
        point_rec = point_w
        if cfg.include_shiny_surface_error:
            factor = 1.0 - shininess
            if face_pack is not None:
                comp_rand = frow[:, 19] * SHINY_MODEL_WEIGHT
            else:
                comp_rand = noise_mod.stream_sample(
                    noise_buf, comp_w.astype(jnp.uint32),
                    noise_mod.MODEL_COMP_STREAM) * SHINY_MODEL_WEIGHT
            pt_rand = nz[:, noise_mod.POINT_STREAM] * SHINY_INDIVIDUAL_ERROR
            shift = (dir_w * (factor * factor * corrected
                              * SHINY_DISTANCE_WEIGHT)[:, None]
                     + dir_w * ((comp_rand + pt_rand) * factor)[:, None])
            point_rec = point_rec + shift
        if cfg.include_terrain_induced_error:
            height = start_w[:, 1] - point_rec[:, 1]
            vn = nz[:, noise_mod.TERRAIN_V_STREAM]
            hn = nz[:, noise_mod.TERRAIN_H_STREAM]
            v_err = vn * (VERTICAL_TERRAIN_ERROR_HEIGHT_W * height
                          + VERTICAL_TERRAIN_ERROR_ANGLE_W * angle)
            h_err = hn * HORIZONTAL_TERRAIN_ERROR_W * height
            h_axis = jnp.stack([
                nz[:, noise_mod.AXIS_X_STREAM],
                jnp.zeros_like(v_err),
                nz[:, noise_mod.AXIS_Z_STREAM]], -1)
            shift = (jnp.array([0.0, 1.0, 0.0]) * v_err[:, None]
                     + h_axis * h_err[:, None])
            point_rec = jnp.where((is_terrain & valid_col)[:, None],
                                  point_rec + shift, point_rec)

        if face_pack is not None:
            uv0, uv1, uv2 = frow[:, 9:11], frow[:, 11:13], frow[:, 13:15]
        else:
            uvs = scene.vertex_uv[verts_w]                          # (P, 3, 2)
            uv0, uv1, uv2 = uvs[:, 0], uvs[:, 1], uvs[:, 2]
        uv_rec = (uv0 * (1.0 - u_w - v_w)[:, None]
                  + uv1 * u_w[:, None]
                  + uv2 * v_w[:, None])

        z = lambda v: jnp.where(valid_col, v, 0.0)   # sanitize masked slots
        record = ReturnRecord(
            mask=valid_col,
            point=jnp.where(valid_col[:, None], point_rec, 0.0),
            normal=jnp.where(valid_col[:, None], normal_w, 0.0),
            uv=jnp.where(valid_col[:, None], uv_rec, 0.0),
            distance=z(corrected),
            angle=z(angle),
            gps_time=z(gps),
            comp=jnp.where(valid_col, comp_w, -1),
            material=jnp.where(valid_col, mat_w, 0),
            face=jnp.where(valid_col, face_w, -1),
            num_intersected=num_intersected,
            return_number=return_count,
            winner_ray=w.astype(jnp.int32),
            start=start_w,
            direction=dir_w,
            prev_was_water=prev_water,
            prev_point=prev_point,
        )

        # -------- outliers (`addOutlier-comp.glsl:29-64`) ------------------
        # per-collision draw: the row depends on both the pulse AND the
        # return level, matching the reference's per-level collision-buffer
        # indexing (`addOutlier-comp.glsl:41,45`)
        onz = noise_mod.stream_rows(
            noise_buf,
            pulse_gidx + level * jnp.uint32(OUTLIER_LEVEL_STRIDE))  # (P, 16)
        o_prob = onz[:, noise_mod.OUTLIER_STREAM]
        o_mask = valid_col & ((o_prob * 2.0 - 1.0) > scalars.outlier_threshold) \
            if cfg.include_outliers else jnp.zeros_like(valid_col)
        o_dn = onz[:, noise_mod.OUTLIER_DISTANCE_STREAM] * 1.5
        o_r0, o_r1 = scalars.outlier_range[0], scalars.outlier_range[1]
        o_dist = (o_dn * (o_r1 - o_r0) + o_r0) * corrected
        # addOutlier reads previousDirection AFTER reduceCollisions updated
        # it: the winner ray continues (and gets previousDirection :=
        # direction) only on a bathymetric water revive
        # (`reduceCollisions-comp.glsl:156-161`, `computeRayDirection` :69).
        exceed = (return_count + 1) >= max_returns
        winner_continues = (~exceed) & is_water & bool(bathymetric)
        prev_dir_w = _unit(jnp.where(winner_continues[:, None],
                                     dir_w, prev_dir_w_raw))
        outlier = OutlierRecord(
            mask=o_mask,
            point=start_w + prev_dir_w * o_dist[:, None],
            distance=o_dist,
        )

        # -------- state update (`validateCollision` :152-170) --------------
        revive = valid_hit & is_water[:, None] & bool(bathymetric)
        new_active_valid = (~exceed[:, None]) & (continue_ray | revive)
        active_next = jnp.where(valid_col[:, None], new_active_valid,
                                continue_ray).reshape(N)
        eta = mrow[:, 0]
        # Orient the interface normal against the incident ray (robust to
        # mesh winding; GLSL refract assumes dot(N, I) < 0 and the
        # reference trusts its models' winding).
        n2 = repv(normal_w)                                       # (N, 3)
        flip = jnp.sign(jnp.sum(n2 * dir2, axis=-1, keepdims=True))
        n_or = -jnp.where(flip == 0, 1.0, flip) * n2
        refr2 = _unit(_refract(dir2, n_or, rep(eta)))
        water_upd2 = rep(valid_col & is_water)[:, None]           # (N, 1)
        origin_next = jnp.where(water_upd2, point_i2 + dir2 * 1e-4, origin2)
        dir_next = jnp.where(water_upd2, refr2, dir2)
        # previousDirection := direction only for CONTINUING rays (the
        # reference writes it inside `computeRayDirection`, which only the
        # continue branch calls — `reduceCollisions-comp.glsl:156-161`).
        prev_dir_next = jnp.where(
            (valid_col[:, None] & new_active_valid).reshape(N)[:, None],
            dir2, prev2)
        count_next = return_count + valid_col.astype(jnp.int32)
        prev_water_next = jnp.where(valid_col, is_water, prev_water)
        # the reference stores the ERROR-SHIFTED point in the collision
        # buffer (`validateCollision` translates before the compact copy),
        # and bathymetric transmitDir reads that stored point
        # (`computeIntensity-comp.glsl:27`)
        prev_point_next = jnp.where(valid_col[:, None], point_rec, prev_point)

        new_state = (origin_next, dir_next, prev_dir_next, active_next,
                     count_next, prev_water_next, prev_point_next,
                     level + jnp.uint32(1))
        return new_state, (record, outlier)

    init = (
        rays.origin.reshape(N, 3),
        rays.direction.reshape(N, 3),
        rays.direction.reshape(N, 3),                 # previousDirection
        jnp.ones(N, bool),                            # continueRay
        jnp.zeros(P, jnp.int32),                      # returnNumber
        jnp.zeros(P, bool),                           # prev collision water?
        jnp.zeros((P, 3), jnp.float32),               # prev collision point
        jnp.uint32(0),                                # return level index
    )
    if max_returns == 1:
        # unrolled single-return fast path (avoids scan overhead)
        final_state, (records, outliers) = step(init, hits0)
        records = jax.tree.map(lambda a: a[None], records)
        outliers = jax.tree.map(lambda a: a[None], outliers)
    elif not retraverse:
        # no continuing ray ever changes direction, and origins only move
        # forward along the ray: per-ray nearest hits are level-invariant
        final_state, (records, outliers) = jax.lax.scan(
            lambda st, _: step(st, hits0), init,
            jnp.arange(max_returns))
    else:
        # level 0 unrolled on the primary traversal; refracted bounce
        # levels re-traverse the full tree
        state1, (rec0, out0) = step(init, hits0)

        def bounce(st, _):
            return step(st, bounce_traverse_fn(st[0].reshape(P, R, 3),
                                               st[1].reshape(P, R, 3)))

        final_state, (rec_r, out_r) = jax.lax.scan(
            bounce, state1, jnp.arange(max_returns - 1))
        records = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, rec_r)
        outliers = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), out0, out_r)
    num_returns = final_state[4]
    final_origin = final_state[0].reshape(P, R, 3)
    return records, outliers, num_returns, final_origin


def _returns_noretraverse(
        scene: TriangleScene, materials: MaterialTable, rays: RayBundle,
        noise_buf: jax.Array, scalars: SimScalars, cfg: SensorConfig,
        hits0, face_pack, faces_aug, base_ray_index, sensor_normal,
        vertex_grad_aux=None):
    """Return extraction for water-free, non-bathymetric scenes.

    Key structural fact: continuing rays never change origin or direction
    (refraction is the only mutator, `reduceCollisions-comp.glsl:64-73`),
    so across return levels only the ACTIVE mask and per-pulse counters
    evolve — all of it discrete.  The level loop therefore runs entirely
    on stop-gradient values (zero AD residuals, nothing saved per level),
    and every differentiable record field is recomputed ONCE afterwards,
    vectorized over (L, P): one face-row gather (one backward scatter into
    the face table / vertices instead of one per level), L unique-index
    winner-row gathers on the constant ray arrays, one refine + normal +
    shading-input evaluation.  Record values are bit-identical to the
    scan path (same ops, same order; XLA CSEs the duplicated forward).

    This is where the full-gradient 2x step cost of round 3 went: the
    per-level winner-row custom-VJP scatters, per-level face-row scatter
    transposes, and the scan's stacked (L, N, k) carry residuals.
    """
    P, R = rays.num_pulses, rays.rays_per_pulse
    N = P * R
    L = cfg.max_returns
    sg = jax.lax.stop_gradient
    base_ray_index = jnp.asarray(base_ray_index, jnp.uint32)

    # ---- differentiable constants (level-invariant) ----------------------
    origin2 = rays.origin.reshape(N, 3)
    dir2 = rays.direction.reshape(N, 3)
    cat6 = jnp.concatenate([origin2, dir2], axis=1)            # (N, 6)

    # ---- stop-gradient world for the discrete loop ------------------------
    o2_sg, d2_sg = sg(origin2), sg(dir2)
    t2_sg = sg(hits0.t.reshape(N))
    face2 = hits0.face.reshape(N)                              # int, no grads
    t_pr_sg = t2_sg.reshape(P, R)
    faces_pr = face2.reshape(P, R)
    scal_sg = sg(scalars)
    point_i2_sg = o2_sg + d2_sg * jnp.where(face2 >= 0, t2_sg, 0.0)[:, None]
    if face_pack is not None:
        fp_sg = sg(face_pack)
    else:
        fp_sg = None
        comp_aug = jnp.stack([scene.comp_material, scene.comp_surface],
                             axis=1)
        vksns_sg = sg(jnp.stack([scene.vertex_ks, scene.vertex_ns], axis=1))
        mat_aug = jnp.stack([materials.refractive_index,
                             materials.roughness], axis=1)
        verts_sg = sg(scene.vertices)

    def winner_static(flat_w, face_w, has_winner):
        """Per-winner shininess + hit point on sg values (decisions only)."""
        o_w, d_w = o2_sg[flat_w], d2_sg[flat_w]
        if fp_sg is not None:
            frow = fp_sg[jnp.maximum(face_w, 0)]
            v0, v1, v2 = frow[:, 0:3], frow[:, 3:6], frow[:, 6:9]
            ksns, mrow = frow[:, 15:17], frow[:, 17:19]
        else:
            rows_w = faces_aug[jnp.maximum(face_w, 0)]         # (P, 4)
            v0 = verts_sg[rows_w[:, 0]]
            v1 = verts_sg[rows_w[:, 1]]
            v2 = verts_sg[rows_w[:, 2]]
            ksns = vksns_sg[rows_w[:, 0]]
            mrow = sg(mat_aug)[comp_aug[rows_w[:, 3]][:, 0]]
        _, point_w, _, _ = refine_hit_verts(o_w, d_w, v0, v1, v2, face_w)
        point_w = jnp.where(has_winner[:, None], point_w, o_w)
        normal_w = face_normal_from_verts(v0, v1, v2)
        return o_w, d_w, point_w, normal_w, ksns, mrow

    # ---- discrete level loop (unrolled; L <= 5) ---------------------------
    active = jnp.ones(N, bool)
    count = jnp.zeros(P, jnp.int32)
    p_arange = jnp.arange(P, dtype=jnp.int32)
    levels = []
    for _ in range(L):
        valid2 = (face2 >= 0) & active
        valid_hit = valid2.reshape(P, R)
        dist = jnp.where(valid_hit, t_pr_sg, BIG)
        w = jnp.argmin(dist, axis=1)                           # (P,)
        flat_w = p_arange * R + w.astype(jnp.int32)
        face_w = face2[flat_w]
        has_winner = valid2[flat_w]
        (o_w, d_w, point_w, normal_w, ksns,
         mrow) = winner_static(flat_w, face_w, has_winner)

        # footprint merge (`reduceCollisions` :201-223), decisions only
        footprint = _norm(point_w - o_w) * scal_sg.pulse_radius
        cos_inc = jnp.abs(jnp.sum(normal_w * (-_unit(d_w)), axis=-1))
        allowed = 2.0 * footprint * (2.0 - cos_inc)
        d_to_winner = _norm(point_i2_sg.reshape(P, R, 3)
                            - point_w[:, None, :])
        if scene.face_neighbors is not None:
            cont_w = scene.face_neighbors[jnp.maximum(face_w, 0)]
            contiguous = (faces_pr[:, :, None]
                          == cont_w[:, None, :]).any(axis=-1)
        else:
            rows_i = faces_aug[jnp.maximum(faces_pr, 0)]       # (P, R, 4)
            rows_wf = faces_aug[jnp.maximum(face_w, 0)]        # (P, 4)
            contiguous = _faces_contiguous(
                rows_i[..., 0:3], rows_wf[:, None, 0:3],
                rows_i[..., 3], rows_wf[:, 3][:, None])
        same = (valid_hit
                & ((d_to_winner < allowed[:, None])
                   | (faces_pr == face_w[:, None])
                   | contiguous))
        same = same & has_winner[:, None]
        num_intersected = jnp.sum(same, axis=1).astype(jnp.int32)
        continue_ray = valid_hit & ~same

        # validation (`validateCollision` :132-151), decisions only
        corrected = _norm(point_w - o_w)
        nz = noise_mod.stream_rows(
            noise_buf, base_ray_index + flat_w.astype(jnp.uint32))
        dnoise = nz[:, noise_mod.DISTANCE_STREAM]
        b0 = scal_sg.max_range_boundary[0]
        b1 = scal_sg.max_range_boundary[1]
        noisy_max = scal_sg.max_range + dnoise * (b1 - b0) + b0
        shininess = jnp.clip(jnp.power(jnp.maximum(ksns[:, 0], 0.0),
                                       ksns[:, 1])
                             * mrow[:, 1], 0.0, 1.0)
        loss_thr = jnp.where(
            shininess < scal_sg.loss_threshold, 0.0,
            scal_sg.loss_mult * jnp.power(
                jnp.maximum(shininess + scal_sg.loss_add, 0.0),
                scal_sg.loss_power))
        lost = nz[:, noise_mod.LOSS_STREAM] <= loss_thr
        valid_col = has_winner & (corrected < noisy_max) & ~lost

        exceed = (count + 1) >= L
        new_active_valid = (~exceed[:, None]) & continue_ray
        active = jnp.where(valid_col[:, None], new_active_valid,
                           continue_ray).reshape(N)
        levels.append(dict(flat_w=flat_w, w=w.astype(jnp.int32),
                           face_w=face_w, has_winner=has_winner,
                           valid_col=valid_col,
                           num_intersected=num_intersected,
                           count_entry=count))
        count = count + valid_col.astype(jnp.int32)
    num_returns = count

    # ---- differentiable record pass, vectorized over K = L*P --------------
    # All heavy math runs on FLAT (K,) shapes: (L, P) tensors get laid out
    # as T(L,128) tiles (L=2 -> 2-sublane strips), and the whole stacked
    # record pass + its backward paid a measured ~3x efficiency penalty on
    # those layouts (r5 bisection: every gradient chain's cost roughly
    # TRIPLED from L=1 to L=2 while the record row count only doubled).
    # The public ReturnRecord keeps (L, P) fields — reshaped at the end.
    st = lambda k: jnp.stack([lv[k] for lv in levels])          # (L, P)
    K = L * P
    flat_w_L = st("flat_w")
    face_w_L = st("face_w")
    has_winner_L = st("has_winner")
    valid_col_L = st("valid_col")
    flat_w_K = flat_w_L.reshape(K)
    face_w_K = face_w_L.reshape(K)
    has_winner = has_winner_L.reshape(K)
    valid_col = valid_col_L.reshape(K)

    w_L = st("w")                                               # (L, P)
    pack = _winner_rows_pr(R, cat6, w_L).reshape(K, 6)
    origin_w = pack[:, 0:3]            # == start point == prev-level origin
    dir_w = pack[:, 3:6]               # == previousDirection (never mutated)

    safe_face = jnp.maximum(face_w_K, 0)
    if face_pack is not None:
        frow = face_pack[safe_face]                             # (K, 23)
        v0, v1, v2 = frow[..., 0:3], frow[..., 3:6], frow[..., 6:9]
        uv0, uv1, uv2 = frow[..., 9:11], frow[..., 11:13], frow[..., 13:15]
        ksns, mrow = frow[..., 15:17], frow[..., 17:19]
        comp_rand_sh = frow[..., 19]
        comp_w = frow[..., 20].astype(jnp.int32)
        mat_w = frow[..., 21].astype(jnp.int32)
        surface_w = frow[..., 22].astype(jnp.int32)
    else:
        rows_w = faces_aug[safe_face]                           # (K, 4)
        vidx = rows_w[..., 0:3]
        # ONE gather of all three corners.  With beam-cull aux available,
        # the backward goes through the scatter-free static-union path
        # (`_winner_verts_union`); otherwise the stock gather transpose is
        # ONE (V, 3) scatter-add instead of three.  Static shape checks
        # catch an aux built for a different scene (wrong V) or chunk
        # length — a clear error, not silently wrong gradients (advisor
        # r04, medium); deeper staleness is caught host-side by
        # `VertexGradAux.check_consistent`.
        if vertex_grad_aux is not None:
            aux = vertex_grad_aux
            if P % aux.block_pulses != 0:
                raise ValueError(
                    f"vertex_grad_aux block_pulses={aux.block_pulses} does "
                    f"not divide chunk pulses P={P}")
            if aux.num_pulses not in (-1, P):
                raise ValueError(
                    f"vertex_grad_aux built for {aux.num_pulses} pulses, "
                    f"used with P={P}")
            if aux.bounds.shape[0] != scene.vertices.shape[0] + 1:
                raise ValueError(
                    f"vertex_grad_aux bounds cover "
                    f"{aux.bounds.shape[0] - 1} vertices but scene has "
                    f"{scene.vertices.shape[0]} (aux from another scene?)")
            verts3 = _winner_verts_union(
                scene.vertices, vidx.reshape(L, P, 3), has_winner_L,
                vertex_grad_aux).reshape(K, 3, 3)
        else:
            # NOTE (measured r5): a device-argsort segment-sum backward was
            # tried for this no-aux gather and for the BRDF window gather;
            # XLA:TPU sort is so slow it REGRESSED the 131k 2-return step
            # 2.1x (20.9 -> 9.7 M rays/s).  The stock scatter stays.
            verts3 = scene.vertices[vidx]                       # (K, 3, 3)
        v0, v1, v2 = (verts3[..., 0, :], verts3[..., 1, :],
                      verts3[..., 2, :])
        uvs = scene.vertex_uv[vidx]                             # (K, 3, 2)
        uv0, uv1, uv2 = uvs[..., 0, :], uvs[..., 1, :], uvs[..., 2, :]
        vert_ksns = jnp.stack([scene.vertex_ks, scene.vertex_ns], axis=1)
        ksns = vert_ksns[vidx[..., 0]]
        comp_w = rows_w[..., 3]
        crow_w = comp_aug[comp_w]
        mat_w = crow_w[..., 0]
        surface_w = crow_w[..., 1]
        mrow = mat_aug[mat_w]
        comp_rand_sh = None

    _, point_w, (u_w, v_w), _ = refine_hit_verts(
        origin_w, dir_w, v0, v1, v2, face_w_K)
    normal_w = face_normal_from_verts(v0, v1, v2)
    point_w = jnp.where(has_winner[..., None], point_w, origin_w)
    is_terrain = (surface_w & SURFACE_TERRAIN) != 0

    corrected = _norm(point_w - origin_w)
    nd = _unit(-dir_w)
    angle = (jnp.clip(safe_arccos(
        jnp.sum(nd * sensor_normal * nd, axis=-1)),
        -PI / 2, PI / 2) / (PI / 2) * 90.0)
    gps = jnp.tile(rays.gps_time, L) + corrected * 2.0 / LIGHT_SPEED

    idx_w = base_ray_index + flat_w_K.astype(jnp.uint32)
    nz = noise_mod.stream_rows(noise_buf, idx_w)                # (K, 16)
    shininess = jnp.clip(jnp.power(jnp.maximum(ksns[..., 0], 0.0),
                                   ksns[..., 1])
                         * mrow[..., 1], 0.0, 1.0)

    point_rec = point_w
    if cfg.include_shiny_surface_error:
        factor = 1.0 - shininess
        if comp_rand_sh is not None:
            comp_rand = comp_rand_sh * SHINY_MODEL_WEIGHT
        else:
            comp_rand = noise_mod.stream_sample(
                noise_buf, comp_w.astype(jnp.uint32),
                noise_mod.MODEL_COMP_STREAM) * SHINY_MODEL_WEIGHT
        pt_rand = nz[..., noise_mod.POINT_STREAM] * SHINY_INDIVIDUAL_ERROR
        shift = (dir_w * (factor * factor * corrected
                          * SHINY_DISTANCE_WEIGHT)[..., None]
                 + dir_w * ((comp_rand + pt_rand) * factor)[..., None])
        point_rec = point_rec + shift
    if cfg.include_terrain_induced_error:
        height = origin_w[..., 1] - point_rec[..., 1]
        vn = nz[..., noise_mod.TERRAIN_V_STREAM]
        hn = nz[..., noise_mod.TERRAIN_H_STREAM]
        v_err = vn * (VERTICAL_TERRAIN_ERROR_HEIGHT_W * height
                      + VERTICAL_TERRAIN_ERROR_ANGLE_W * angle)
        h_err = hn * HORIZONTAL_TERRAIN_ERROR_W * height
        h_axis = jnp.stack([
            nz[..., noise_mod.AXIS_X_STREAM],
            jnp.zeros_like(v_err),
            nz[..., noise_mod.AXIS_Z_STREAM]], -1)
        shift = (jnp.array([0.0, 1.0, 0.0]) * v_err[..., None]
                 + h_axis * h_err[..., None])
        point_rec = jnp.where((is_terrain & valid_col)[..., None],
                              point_rec + shift, point_rec)

    uv_rec = (uv0 * (1.0 - u_w - v_w)[..., None]
              + uv1 * u_w[..., None]
              + uv2 * v_w[..., None])

    # previous recorded point per pulse (record field only; bathymetric
    # shading never reads it on this path)
    point_rec_L = point_rec.reshape(L, P, 3)
    prev_points = []
    prev = jnp.zeros((P, 3), jnp.float32)
    for l in range(L):
        prev_points.append(prev)
        prev = jnp.where(valid_col_L[l][:, None], point_rec_L[l], prev)
    prev_point_L = jnp.stack(prev_points)

    unfl = lambda a: a.reshape((L, P) + a.shape[1:])
    z = lambda v: unfl(jnp.where(valid_col, v, 0.0))
    zv = lambda v: unfl(jnp.where(valid_col[..., None], v, 0.0))
    records = ReturnRecord(
        mask=valid_col_L,
        point=zv(point_rec),
        normal=zv(normal_w),
        uv=zv(uv_rec),
        distance=z(corrected),
        angle=z(angle),
        gps_time=z(gps),
        comp=unfl(jnp.where(valid_col, comp_w, -1)),
        material=unfl(jnp.where(valid_col, mat_w, 0)),
        face=unfl(jnp.where(valid_col, face_w_K, -1)),
        num_intersected=st("num_intersected"),
        return_number=st("count_entry"),
        winner_ray=st("w"),
        start=unfl(origin_w),
        direction=unfl(dir_w),
        prev_was_water=jnp.zeros((L, P), bool),
        prev_point=prev_point_L,
    )

    # outliers (`addOutlier-comp.glsl:29-64`)
    pulse_gidx = (base_ray_index // jnp.uint32(max(R, 1))
                  + jnp.arange(P, dtype=jnp.uint32))
    lvl_idx = jnp.repeat(jnp.arange(L, dtype=jnp.uint32), P)
    onz = noise_mod.stream_rows(
        noise_buf, jnp.tile(pulse_gidx, L)
        + lvl_idx * jnp.uint32(OUTLIER_LEVEL_STRIDE))           # (K, 16)
    o_prob = onz[..., noise_mod.OUTLIER_STREAM]
    o_mask = (valid_col
              & ((o_prob * 2.0 - 1.0) > scalars.outlier_threshold)
              if cfg.include_outliers else jnp.zeros_like(valid_col))
    o_dn = onz[..., noise_mod.OUTLIER_DISTANCE_STREAM] * 1.5
    o_r0, o_r1 = scalars.outlier_range[0], scalars.outlier_range[1]
    o_dist = (o_dn * (o_r1 - o_r0) + o_r0) * corrected
    # no water and no bathymetric -> previousDirection stays = direction
    outliers = OutlierRecord(
        mask=unfl(o_mask),
        point=unfl(origin_w + _unit(dir_w) * o_dist[..., None]),
        distance=unfl(o_dist),
    )
    final_origin = rays.origin                  # origins never move
    return records, outliers, num_returns, final_origin


def final_winner_origins(records: ReturnRecord, final_origin) -> jax.Array:
    """Gather each recorded return's winner-ray origin from the final ray
    state — `computeColor` reads `rayData[collision.rayIndex].origin` *after*
    the bounce loop finished (`computeColor-comp.glsl:77`).

    Flat (P*R, 3) row gather — broadcasting final_origin to (L, P, R, 3)
    for take_along_axis would materialize a tensor XLA lane-pads 12.8x in
    the backward pass (R is the minor dim)."""
    L, P = records.winner_ray.shape
    R = final_origin.shape[1]
    w = jnp.maximum(records.winner_ray, 0)                    # (L, P)
    idx = jnp.arange(P, dtype=jnp.int32)[None, :] * R + w     # (L, P)
    return final_origin.reshape(P * R, 3)[idx.reshape(-1)].reshape(L, P, 3)
