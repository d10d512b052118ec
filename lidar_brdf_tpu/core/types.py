"""Core pytree dataclasses for the TPU-native LiDAR simulator.

These are the TPU-first equivalents of the reference's GPU structs
(`LiDAR_BRDF/Source/Graphics/Core/Model3D.h:37-176`): instead of arrays of
interleaved structs in SSBOs, every field is a separate dense array
(structure-of-arrays) so XLA can lay data out in HBM tiles and fuse gathers.

All shapes are static; validity is expressed with masks instead of the
reference's atomic compaction (`reduceCollisions-comp.glsl:147`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Sentinel for "no face" / "no hit", mirrors UINT_MAX usage in the reference
# (`findBVHCollision-comp.glsl:105-107`) but as a signed value TPUs handle well.
NO_HIT = np.int32(-1)

# Surface flags (reference: `reduceCollisions-comp.glsl:8-9` TERRAIN_MASK/WATER_MASK)
SURFACE_TERRAIN = np.int32(1 << 0)
SURFACE_WATER = np.int32(1 << 1)


def _pytree(cls):
    """Register a dataclass as a JAX pytree with all fields as children."""
    return jax.tree_util.register_dataclass(cls)


def _static_field(**kw):
    return field(metadata=dict(static=True), **kw)


@_pytree
@dataclass
class TriangleScene:
    """Aggregated triangle soup for the whole scene.

    Reference equivalents: `Group3D::aggregateSSBOData` output — vertex /
    face / mesh SSBO triple (`Group3D.cpp:393-454`).  Vertex attributes that
    the LiDAR kernels consume (ks, ns from texture bake, see
    `Model3D.cpp:292-330`) are stored per-vertex; per-component data
    (material id, surface flags, semantic labels; `Model3D.h:619-742`) is
    indexed through ``face_comp``.
    """

    vertices: Array          # (V, 3) f32 positions (global indexing)
    faces: Array             # (F, 3) i32 vertex indices
    face_normals: Array      # (F, 3) f32 unit facet normals
    face_comp: Array         # (F,)  i32 model-component id per face
    # Per-vertex shading attributes (baked from textures in the reference)
    vertex_ks: Array         # (V,)  f32 specular coefficient
    vertex_ns: Array         # (V,)  f32 shininess exponent
    vertex_uv: Array         # (V, 2) f32 texture coordinates
    vertex_kad: Array        # (V, 3) f32 diffuse albedo
    # Per-component tables (C = number of model components)
    comp_material: Array     # (C,) i32 LiDAR material id
    comp_surface: Array      # (C,) i32 surface flag bits (terrain/water)
    comp_semantic: Array     # (C,) i32 custom semantic group
    comp_asprs: Array        # (C,) i32 ASPRS class
    # Optional precomputed contiguity table (geom/adjacency.py): per face,
    # the padded ids of same-component faces sharing >= 1 vertex.  When
    # present, the footprint merge replaces its (pulses x rays)-row vertex
    # gather with one winner-row gather + dense compares.
    face_neighbors: Array | None = None   # (F, MAXN) i32, -1 padded

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_components(self) -> int:
        return self.comp_material.shape[0]

    def aabb(self) -> tuple[Array, Array]:
        return self.vertices.min(axis=0), self.vertices.max(axis=0)


@_pytree
@dataclass
class BVH:
    """Stackless (threaded) BVH in DFS pre-order.

    The reference stores a 2N-1 agglomerative cluster array traversed with a
    200-deep explicit stack per GPU thread (`findBVHCollision-comp.glsl:113`).
    On TPU a per-ray stack would blow up VMEM and create divergent control
    flow, so we thread the tree instead: nodes are laid out in DFS pre-order,
    a hit on an internal node advances to ``node + 1`` (its left child) and a
    miss jumps to ``skip[node]`` (next node outside the subtree).  Traversal
    state per ray is a single int32.
    """

    node_min: Array    # (N, 3) f32
    node_max: Array    # (N, 3) f32
    node_face: Array   # (N,)  i32 face index for leaves, NO_HIT for internal
    node_skip: Array   # (N,)  i32 DFS index to jump to on miss (N = done)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


@_pytree
@dataclass
class MaterialTable:
    """Differentiable per-material parameters.

    Reference: `MaterialDatabase::getMaterialGPUArray`
    (`MaterialDatabase.cpp:229-243`) emits {refractive index n(lambda),
    roughness} plus a packed 360x91 retro-reflectance table per material
    (`BRDFDatabase.cpp:137-215`).  We additionally carry the analytic-BRDF
    model selector and F0 reflectivity used by the parametric mode
    (`reflectIrradiance-comp.glsl`).
    All float leaves are differentiable parameters.
    """

    refractive_index: Array   # (M,)  f32 n(lambda) at the active wavelength
    roughness: Array          # (M,)  f32
    brdf_table: Array         # (M, 360, 91) f32 measured retro-reflectance
    brdf_model: Array         # (M,)  i32 analytic model id (BRDFModel enum)
    reflectivity_f0: Array    # (M, 3) f32 Fresnel F0 for Cook-Torrance

    @property
    def num_materials(self) -> int:
        return self.roughness.shape[0]


@_pytree
@dataclass
class RayBundle:
    """A batch of rays, shaped (P, R): P pulses x R rays per pulse.

    Reference: `RayGPUData` (`Model3D.h:110-151`).  Origin/direction are the
    generated scan rays; ``gps_time`` is stamped by the ray builders.
    """

    origin: Array      # (P, R, 3) f32
    direction: Array   # (P, R, 3) f32  (unit)
    gps_time: Array    # (P,) f32  (per pulse)

    @property
    def num_pulses(self) -> int:
        return self.origin.shape[0]

    @property
    def rays_per_pulse(self) -> int:
        return self.origin.shape[1]


@_pytree
@dataclass
class Hit:
    """Per-ray nearest intersection (dense, mask-valid).

    Reference: `TriangleCollisionGPUData` (`Model3D.h:153-176`), minus the
    fields that only exist to emulate compaction/linked lists.
    """

    t: Array          # (...,) f32 distance along ray (inf when no hit)
    face: Array       # (...,) i32 face index (NO_HIT when none)

    @property
    def valid(self) -> Array:
        return self.face >= 0


@_pytree
@dataclass
class PointCloud:
    """Dense LAS-style simulation output with a validity mask.

    One slot per (return level, pulse); invalid slots are masked out.
    Field set mirrors `LiDARPointCloud::writePLY`
    (`LiDARPointCloud.cpp:167-178`).
    """

    position: Array        # (K, 3) f32
    normal: Array          # (K, 3) f32
    uv: Array              # (K, 2) f32
    intensity: Array       # (K,)  f32
    distance: Array        # (K,)  f32  corrected range from sensor
    return_number: Array   # (K,)  i32  1-based
    num_returns: Array     # (K,)  i32
    scan_angle_rank: Array # (K,)  f32  degrees in [-90, 90]
    scan_direction: Array  # (K, 3) f32
    gps_time: Array        # (K,)  f32
    comp_id: Array         # (K,)  i32 model component (-1 for outliers)
    semantic: Array        # (K,)  i32
    asprs: Array           # (K,)  i32
    mask: Array            # (K,)  bool validity

    @property
    def capacity(self) -> int:
        return self.intensity.shape[0]

    def num_points(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def compact_host(self) -> "PointCloud":
        """Host-side compaction: drop invalid slots (returns numpy arrays)."""
        mask = np.asarray(self.mask)
        take = lambda a: np.asarray(a)[mask]
        return PointCloud(**{f.name: take(getattr(self, f.name))
                             for f in dataclasses.fields(self) if f.name != "mask"},
                          mask=np.ones(int(mask.sum()), dtype=bool))


def concat_pointclouds(clouds: list[PointCloud]) -> PointCloud:
    """Concatenate chunked results (host side)."""
    cat = lambda name: np.concatenate([np.asarray(getattr(c, name)) for c in clouds])
    return PointCloud(**{f.name: cat(f.name) for f in dataclasses.fields(PointCloud)})


# ---------------------------------------------------------------------------
# Device-side compaction (VERDICT r04 item 1a).
#
# The reference reads back a COMPACTED collision buffer (atomic compaction in
# `reduceCollisions-comp.glsl:147`, bulk readback `LiDARSimulation.cpp:
# 603-614`); the dense (levels x pulses) slot layout here would instead read
# back every slot of ~20 separate fields and compact on host.  `pack_compact`
# runs inside the simulate_chunk jit: a stable valid-first argsort replaces
# the atomic counter (no atomics on TPU; a single sorted gather instead), and
# every field packs into ONE (K, 20) f32 matrix so the host fetches a single
# contiguous prefix of `count` rows — bounding readback bytes to actual
# points and paying one transfer instead of ~20.
# ---------------------------------------------------------------------------

# column layout of the packed readback matrix (all exact in f32: int fields
# are ids < 2^24)
COMPACT_COLS = 20
_COMPACT_INT_FIELDS = ("return_number", "num_returns", "comp_id",
                       "semantic", "asprs")


def pack_compact(cloud: PointCloud) -> tuple[Array, Array]:
    """(matrix (K, 20) f32 with valid rows first, count i32) — device side."""
    order = jnp.argsort(jnp.logical_not(cloud.mask), stable=True)
    f = lambda a: a.astype(jnp.float32)[:, None]
    cols = jnp.concatenate([
        cloud.position, cloud.normal, cloud.uv,
        f(cloud.intensity), f(cloud.distance),
        f(cloud.return_number), f(cloud.num_returns),
        f(cloud.scan_angle_rank), cloud.scan_direction,
        f(cloud.gps_time), f(cloud.comp_id),
        f(cloud.semantic), f(cloud.asprs),
    ], axis=1)
    return cols[order], jnp.sum(cloud.mask.astype(jnp.int32))


def unpack_compact(rows: np.ndarray) -> PointCloud:
    """Host-side inverse of `pack_compact` for the fetched prefix."""
    rows = np.asarray(rows)
    n = rows.shape[0]
    i32 = lambda c: rows[:, c].astype(np.int32)
    return PointCloud(
        position=rows[:, 0:3], normal=rows[:, 3:6], uv=rows[:, 6:8],
        intensity=rows[:, 8], distance=rows[:, 9],
        return_number=i32(10), num_returns=i32(11),
        scan_angle_rank=rows[:, 12], scan_direction=rows[:, 13:16],
        gps_time=rows[:, 16], comp_id=i32(17),
        semantic=i32(18), asprs=i32(19),
        mask=np.ones(n, dtype=bool),
    )
