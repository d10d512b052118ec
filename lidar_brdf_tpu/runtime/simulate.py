"""Simulation orchestrator: the jitted forward pass + host-side chunking.

Replaces the reference's CPU-driven kernel sequencing
(`LiDARSimulation::launchSingleSimulation` / `solveRayIntersection`,
LiDARSimulation.cpp:288-618): one jit-compiled function maps a chunk of
pulses to a dense PointCloud; a host loop streams chunks (the reference's
`arePendingRays` memory-bounded batching, RayBuilder.cpp:248-262) and
concatenates; a wavelength sweep re-binds material tables per wavelength
(cpp:303).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SensorConfig
from ..core.types import (BVH, MaterialTable, PointCloud, RayBundle,
                          SURFACE_WATER, TriangleScene, concat_pointclouds,
                          pack_compact, unpack_compact)
from ..physics.returns import SimScalars, simulate_returns
from ..physics.shading import shade_records
from ..physics.types import OutlierRecord, ReturnRecord
from ..utils import noise as noise_mod


def coherent_order(rays: RayBundle) -> RayBundle:
    """Permute pulses by Morton code of (origin, direction) so consecutive
    pulses — and therefore traversal tiles — are compact angular/spatial
    clusters rather than long scan columns.  Point clouds are order-free
    (every attribute is per-pulse), so no un-permutation is needed."""
    from ..geom.morton import morton3d_np
    o = np.asarray(rays.origin)[:, 0, :]
    d = np.asarray(rays.direction)[:, 0, :]
    span = lambda a: (a.min(axis=0), np.where(
        a.max(axis=0) - a.min(axis=0) < 1e-9,
        a.min(axis=0) + 1.0, a.max(axis=0)))
    m_d = morton3d_np(d, *span(d)).astype(np.uint64)
    m_o = morton3d_np(o, *span(o)).astype(np.uint64)
    # coarse origin cell first (ALS flight segments), direction within
    key = ((m_o >> np.uint64(12)) << np.uint64(30)) | m_d
    order = np.argsort(key, kind="stable")
    return jax.tree.map(lambda a: np.asarray(a)[order], rays)


def bsp_order(rays: RayBundle, block_pulses: int = 64) -> RayBundle:
    """Permute pulses into contiguous blocks with small angular/spatial
    extent by recursive median split (no Morton code-space discontinuities —
    every block is a real cluster, so beam-culling tiles stay narrow).
    Point clouds are order-free, so no un-permutation is needed."""
    from ..geom.beamcull import bsp_order_np
    o = np.asarray(rays.origin)[:, 0, :]
    d = np.asarray(rays.direction)[:, 0, :]
    o_ext = max(float((o.max(axis=0) - o.min(axis=0)).max()), 1e-9)
    feat = np.concatenate([d, (o - o.min(axis=0)) * (2.0 / o_ext)], axis=1)
    order = bsp_order_np(feat, block_pulses)
    return jax.tree.map(lambda a: np.asarray(a)[order], rays)


def records_to_pointcloud(scene: TriangleScene, records: ReturnRecord,
                          outliers: OutlierRecord, num_returns: jax.Array,
                          intensity: jax.Array,
                          include_outliers: bool) -> PointCloud:
    """Flatten (levels, pulses) record slots into a dense PointCloud."""
    L, P = records.mask.shape
    flat = lambda a: a.reshape((L * P,) + a.shape[2:])
    nr = jnp.broadcast_to(num_returns[None, :], (L, P))
    comp = flat(records.comp)
    safe_comp = jnp.maximum(comp, 0)
    # one row gather for both label tables (TPU gathers are priced per row)
    sem_rows = jnp.stack([scene.comp_semantic, scene.comp_asprs],
                         axis=1)[safe_comp]
    cloud = PointCloud(
        position=flat(records.point),
        normal=flat(records.normal),
        uv=flat(records.uv),
        intensity=flat(intensity),
        distance=flat(records.distance),
        return_number=flat(records.return_number),
        num_returns=flat(nr),
        scan_angle_rank=flat(records.angle),
        scan_direction=flat(records.direction),
        gps_time=flat(records.gps_time),
        comp_id=comp,
        semantic=jnp.where(comp >= 0, sem_rows[:, 0], -1),
        asprs=jnp.where(comp >= 0, sem_rows[:, 1], -1),
        mask=flat(records.mask),
    )
    if not include_outliers:
        return cloud
    K = L * P
    zeros3 = jnp.zeros((K, 3), jnp.float32)
    out = PointCloud(
        position=flat(outliers.point),
        normal=zeros3,
        uv=jnp.zeros((K, 2), jnp.float32),
        intensity=jnp.zeros(K, jnp.float32),
        distance=flat(outliers.distance),
        return_number=jnp.zeros(K, jnp.int32),
        num_returns=jnp.ones(K, jnp.int32),
        scan_angle_rank=jnp.zeros(K, jnp.float32),
        scan_direction=zeros3,
        gps_time=jnp.zeros(K, jnp.float32),
        comp_id=jnp.full(K, -1, jnp.int32),
        semantic=jnp.full(K, -1, jnp.int32),
        asprs=jnp.full(K, 7, jnp.int32),          # ASPRS NOISE
        mask=flat(outliers.mask),
    )
    join = lambda a, b: jnp.concatenate([a, b], axis=0)
    return jax.tree.map(join, cloud, out)


def simulate_chunk(scene: TriangleScene, bvh: BVH, materials: MaterialTable,
                   rays: RayBundle, noise_buf: jax.Array,
                   scalars: SimScalars, cfg: SensorConfig, *,
                   base_ray_index=0, scene_has_water: bool = True,
                   traverse_fn=None, traverse_data=None,
                   vertex_grad_aux=None) -> PointCloud:
    """Full differentiable forward pass for one chunk of pulses."""
    records, outliers, num_returns, final_origin = simulate_returns(
        scene, bvh, materials, rays, noise_buf, scalars, cfg,
        base_ray_index=base_ray_index, traverse_fn=traverse_fn,
        traverse_data=traverse_data, scene_has_water=scene_has_water,
        vertex_grad_aux=vertex_grad_aux)
    # winner origins after the bounce loop (reference shading reads final
    # rayData, `computeColor-comp.glsl:88,96`).  Water-free non-bathymetric
    # scenes never move a ray origin, so the post-loop winner origin IS the
    # recorded start point — skip the (L, P) gather and its scatter
    # transpose entirely on that path.
    if scene_has_water or cfg.bathymetric:
        from ..physics.returns import final_winner_origins
        fo = final_winner_origins(records, final_origin)
    else:
        fo = records.start
    intensity = shade_records(scene, materials, records, fo, scalars, cfg,
                              rays.rays_per_pulse)
    return records_to_pointcloud(scene, records, outliers, num_returns,
                                 intensity, cfg.include_outliers)


def _is_pulse_culler(culler) -> bool:
    from ..kernels.pulse_pallas import PulseLadderTraverser
    return isinstance(culler, PulseLadderTraverser)


@dataclass
class Simulator:
    """Bind scene + config; jit once per chunk shape; stream chunks.

    ``simulator(rays)`` accepts any number of pulses; pulses are processed
    in ``cfg.chunk_pulses`` slices (padded to a static shape) and results
    concatenated on host.

    Traversal strategy (fastest first):
      * per-pulse candidate ladders (`kernels/pulse_pallas.py`) — default
        on TPU for scenes above ~100k faces: each pulse's narrow cone is
        culled against the BVH on the host once per chunk; pre-packed
        ladders make the device step pure arithmetic.  Small scenes use
        the Pallas tile kernel instead (shared candidates beat per-pulse
        row duplication there; see __post_init__ for the measurements).
      * beam-culled dense intersection (`geom/beamcull.py`) — default on
        CPU for water-free scenes: pulses are BSP-reordered into coherent
        640-ray blocks (point clouds are order-free), per-chunk candidate
        lists are built on the host, and the device does dense vector math.
      * packet traversal (`geom/packet.py`) — water/bathymetric scenes
        (refracted re-traversals need the full tree) and explicit opt-out.
      * Pallas tile kernel — explicit opt-in via ``use_pallas`` (interpret
        mode on CPU).
    """

    scene: TriangleScene
    bvh: BVH
    materials: MaterialTable
    cfg: SensorConfig
    traverse_fn: object = None
    use_pulse: bool | None = None     # None = auto (TPU backends)
    use_pallas: bool | None = None    # explicit opt-in only (tile kernel)
    use_culled: bool | None = None    # None = auto (water-free scenes)
    reorder: bool | None = None       # None = auto (when culled is active)
    pulse_group: int | None = None    # None = auto; pulses per shared ladder
    cache_ladders: bool = True        # reuse culled ladders across runs
    cache_ladders_max: int = 64       # cached chunks (FIFO evict; HBM bound)
    # Device-side point compaction before readback (`pack_compact`): the
    # host fetches one (points, 20) f32 prefix instead of every dense slot
    # of ~20 fields — the reference's compacted-collision-buffer readback
    # (`reduceCollisions-comp.glsl:147` + `LiDARSimulation.cpp:603-614`).
    # None = auto (on for TPU backends, off on CPU where transfers are
    # free and tests compare dense slot layouts).  Output PointClouds are
    # order-free either way; compacted clouds have mask all-True.
    compact_readback: bool | None = None

    def __post_init__(self):
        from ..api import attach_face_neighbors
        self.scene = attach_face_neighbors(self.scene)
        self.scene_has_water = bool(
            (np.asarray(self.scene.comp_surface) & SURFACE_WATER).any())
        # `use_pallas` now selects the Pallas *culled* kernel explicitly
        # (the only Pallas path; the old per-node walker could not compile
        # on real TPUs).  It shares the culled-traversal machinery below.
        # Water/bathymetric scenes use the hybrid: culled level 0, packet
        # re-traversal for refracted bounce levels (physics/returns.py).
        self._culled_active = (
            (self.use_culled is not False or self.use_pallas)
            and self.traverse_fn is None)
        scene_min_y = float(np.asarray(self.scene.vertices)[:, 1].min())
        self.scalars = SimScalars.from_config(self.cfg, scene_min_y)
        key = jax.random.PRNGKey(self.cfg.seed)
        self.noise_buf = noise_mod.make_sim_noise(key)
        on_tpu_backend = jax.default_backend() in ("tpu", "axon")
        self._compact = (on_tpu_backend if self.compact_readback is None
                         else bool(self.compact_readback))
        self._jitted = self._jit_chunk(self.traverse_fn)
        self._jitted_compact = self._jit_chunk(self.traverse_fn,
                                               compact=True)
        if self._culled_active:
            rpp = max(self.cfg.rays_per_pulse, 1)
            # Pallas kernels on real TPU (the axon plugin names the tunnel
            # backend after itself); XLA dense path elsewhere.
            on_tpu = jax.default_backend() in ("tpu", "axon")
            # Auto traverser choice (measured on v5e, 2026-08): per-pulse
            # ladders duplicate Wald rows per pulse, so on SMALL scenes the
            # shared-candidate tile kernel wins modestly (18.1 vs 15.1
            # M rays/s at 1M pulses x 40k faces), while on DENSE scenes
            # tile footprints explode to ~3k candidates and the tile kernel
            # collapses (0.31 vs 17.5 M rays/s on a 5M-face terrain).  The
            # asymmetry dictates the default: pulse ladders unless the
            # scene is small enough that tile footprints stay cheap.
            small_scene = self.scene.num_faces <= 100_000
            pick_pulse = (self.use_pulse if self.use_pulse is not None
                          else on_tpu and not self.use_pallas
                          and not small_scene)
            pick_pallas = (self.use_pallas if self.use_pallas is not None
                           else on_tpu)
            if pick_pulse:
                from ..kernels.pulse_pallas import PulseLadderTraverser
                self.block_pulses = max(1, 640 // rpp)
                # Pulse grouping: adjacent pulses can share one candidate
                # ladder, cutting Wald-row HBM duplication ~x group at the
                # cost of union-candidate growth.  Measured on v5e (5M-face
                # rough terrain, 131k pulses, full-grad step): group=1
                # 7.9M rays/s vs group=4 4.9M — per-pulse footprints on
                # dense terrain share too few triangles, so group=1 is the
                # default; coarser meshes scanned at high pulse density can
                # opt in.  The group must divide the static chunk shape so
                # grouped lanes never straddle a chunk boundary (zero-
                # direction pad rays inside a tail group are ignored by the
                # cull and miss in the kernel).
                # Restrict the group to a power of two <= chunk_pulses:
                # run() quantizes the actual chunk to min(chunk_pulses,
                # pow2ceil(P)) and raises it to >= group, so power-of-two
                # groups always divide the chunk actually dispatched (a
                # non-power-of-two group that merely divides chunk_pulses
                # can fail to divide the quantized chunk and blow up the
                # grouped traverser's reshape at runtime).
                grp = self.pulse_group if self.pulse_group is not None else 1
                grp = 1 << max(int(grp).bit_length() - 1, 0)
                while grp > 1 and self.cfg.chunk_pulses % grp:
                    grp //= 2
                self.pulse_group = grp
                self._culler = PulseLadderTraverser(
                    self.scene, rays_per_pulse=rpp, group=grp,
                    interpret=not on_tpu)
                b0, b1 = self.cfg.max_range_soft_boundary
                self._culler.t_max = float(self.cfg.max_range
                                           + abs(b0) + abs(b1) + 1.0)
                if self.reorder is None:  # natural scan order is already
                    self.reorder = False  # coherent at group granularity
            elif pick_pallas:
                import math
                from ..kernels.traverse_pallas import PallasCulledTraverser
                step = 128 // math.gcd(128, rpp)     # tile_rays % 128 == 0
                bp0 = max(1, 640 // rpp)
                self.block_pulses = ((bp0 + step - 1) // step) * step
                self._culler = PallasCulledTraverser(
                    self.scene, tile_rays=self.block_pulses * rpp,
                    interpret=not on_tpu)
            else:
                from ..geom.beamcull import CulledTraverser
                self.block_pulses = max(1, 640 // rpp)
                self._culler = CulledTraverser(
                    self.scene, tile_rays=self.block_pulses * rpp, chunk=128)
            self._jitted_culled = self._jit_chunk(self._culler)
            self._jitted_culled_compact = self._jit_chunk(self._culler,
                                                          compact=True)
            b0, b1 = self.cfg.max_range_soft_boundary
            self._t_max = float(self.cfg.max_range
                                + abs(b0) + abs(b1) + 1.0)

    def _jit_chunk(self, traverse_fn, compact: bool = False):
        """Jitted `simulate_chunk`, optionally with in-jit compaction."""
        base = functools.partial(
            simulate_chunk, cfg=self.cfg,
            scene_has_water=self.scene_has_water,
            traverse_fn=traverse_fn)
        if not compact:
            return jax.jit(base)

        def packed(*a, **k):
            return pack_compact(base(*a, **k))
        return jax.jit(packed)

    def run_chunk(self, rays: RayBundle, base_ray_index=0,
                  traverse_data=None, materials=None,
                  compact: bool = False) -> PointCloud:
        """One chunk.  ``compact=False`` returns a dense PointCloud;
        ``compact=True`` returns the `pack_compact` (matrix, count) pair."""
        materials = self.materials if materials is None else materials
        from ..kernels.pulse_pallas import PermutedLayout
        if (isinstance(traverse_data, tuple) and traverse_data
                and isinstance(traverse_data[0], PermutedLayout)):
            # bucket-contiguous pulse-ladder chunk (see _prep_slice): the
            # static layout is baked into a per-layout jitted executable
            return self._culled_exec(traverse_data[0].layout, compact)(
                self.scene, self.bvh, materials, rays, self.noise_buf,
                self.scalars, base_ray_index=base_ray_index,
                traverse_data=traverse_data[1])
        if traverse_data is not None:
            fn = (self._jitted_culled_compact if compact
                  else self._jitted_culled)
            return fn(
                self.scene, self.bvh, materials, rays, self.noise_buf,
                self.scalars, base_ray_index=base_ray_index,
                traverse_data=traverse_data)
        fn = self._jitted_compact if compact else self._jitted
        return fn(self.scene, self.bvh, materials, rays,
                  self.noise_buf, self.scalars,
                  base_ray_index=base_ray_index)

    def _culled_exec(self, layout, compact: bool = False):
        """Jitted `simulate_chunk` bound to one static bucket layout.

        The scatter-free pulse-ladder call path slices each bucket's
        contiguous pulse range with STATIC offsets, so the layout must be
        part of the executable, not the traced data.  The honest cost
        (advisor r04): the layout includes each bucket's REAL pulse count,
        which varies chunk to chunk, so a fresh scan generally compiles
        one executable PER CHUNK (mitigated by the persistent compile
        cache across runs, and by the ladder cache skipping re-prep of
        repeated chunks).  Scenes where this hurts should use the tile
        traverser, whose bucket shapes are quantized.  The cache is
        FIFO-bounded like _ladder_cache/_bsp_cache so long multi-scene
        sessions do not accumulate executables without bound.  A shared-
        layout clone keeps the worker-thread cull race-free (the bound
        traverser itself is never mutated)."""
        cache = self.__dict__.setdefault("_culled_exec_cache", {})
        key = (layout, compact)
        fn = cache.get(key)
        if fn is None:
            clone = object.__new__(type(self._culler))
            clone.__dict__ = dict(self._culler.__dict__)
            clone.layout = layout
            fn = self._jit_chunk(clone, compact=compact)
            while len(cache) >= 64:
                cache.pop(next(iter(cache)))
            cache[key] = fn
        return fn

    def run(self, rays: RayBundle, checkpoint_dir: str | None = None,
            metrics=None, materials: MaterialTable | None = None
            ) -> PointCloud:
        """Chunked execution over all pulses; host-side concat + compact.

        With ``checkpoint_dir``, finished chunks are persisted and a
        restarted run resumes after the last completed chunk.  When the
        beam-culled path is active, pulses are processed in BSP order
        (reproducible; affects which noise-stream value each pulse draws,
        not the distribution — the output PointCloud is order-free).

        ``materials`` overrides the bound MaterialTable WITHOUT recompiling
        (tables are traced arguments) — the reference's per-wavelength
        material SSBO re-bind (`LiDARSimulation.cpp:303,428-437`).

        Host candidate building is DOUBLE-BUFFERED: a worker thread culls
        chunk i+1's ladders/buckets (numpy + the native OpenMP culler, both
        GIL-releasing) while chunk i's device program runs — the reference's
        `while arePendingRays()` loop overlaps nothing
        (`LiDARSimulation.cpp:316-341`).
        """
        run_key = None
        if self._culled_active and self.reorder is not False:
            # repeat scans (sweeps, re-runs) skip the BSP re-sort AND the
            # 250 MB host gather it implies (~5 s/run on a 2-vCPU host):
            # the permuted bundle is cached on ray content, and the same
            # content hash keys every chunk's ladder-cache entry below (one
            # hash per run instead of one per chunk per pass)
            run_key = self._ray_key(rays)
            cache = self.__dict__.setdefault("_bsp_cache", {})
            hit = cache.get(run_key)
            if hit is None:
                hit = bsp_order(rays, self.block_pulses)
                while len(cache) >= 2:          # FIFO, host-memory bound
                    cache.pop(next(iter(cache)))
                cache[run_key] = hit
            rays = hit
        P = rays.num_pulses
        # quantize the static chunk shape to a power of two: different
        # scans/scenes then reuse the same compiled executable (and repeat
        # CLI runs hit the persistent compilation cache); the tail-pad
        # machinery absorbs the rounding
        chunk = min(self.cfg.chunk_pulses, 1 << max(P - 1, 1).bit_length())
        # grouped pulse ladders need the chunk to be a multiple of the
        # group (both are powers of two after __post_init__'s restriction)
        chunk = max(chunk, getattr(self, "pulse_group", None) or 1)
        ckpt = None
        done = 0
        clouds = []
        if checkpoint_dir is not None:
            from .checkpoint import ChunkCheckpointer
            ckpt = ChunkCheckpointer(checkpoint_dir)
            done = ckpt.completed_chunks()
            clouds = [ckpt.load_chunk(i) for i in range(done)]
        spans = [(ci, lo, min(lo + chunk, P))
                 for ci, lo in enumerate(range(0, P, chunk)) if ci >= done]
        if not spans:
            return concat_pointclouds(clouds)

        from concurrent.futures import ThreadPoolExecutor

        def prep(lo, hi):
            key = (f"{run_key}:{lo}:{hi}:{chunk}"
                   if run_key is not None else None)
            if key is not None and self.cache_ladders:
                hit = getattr(self, "_ladder_cache", {}).get(key)
                if hit is not None:   # skip the 30 MB pad-slice copy too
                    return hit
            return self._prep_slice(self._pad_slice(rays, lo, hi, chunk),
                                    metrics, key=key)

        compact = self._compact
        # per-chunk point-count hints from earlier passes: a repeat scan
        # prefetches exactly the right compacted prefix at DISPATCH time,
        # so the cached hot loop pays zero extra tunnel round trips (a
        # count-fetch-then-slice sequence serialized ~2 RTTs per chunk)
        hints = self.__dict__.setdefault("_count_hints", {})

        def _pad_rows(n, cap):
            # quantized prefix: each distinct padded length compiles a
            # tiny slice program, so round up to 8192-row multiples
            # (<= 0.7 MB overshoot, <= K/8192 programs per chunk shape)
            return min(-(-max(n, 1) // 8192) * 8192, cap)

        def start_fetch(result, hint_key=None):
            if compact:
                mat, cnt = result
                cnt.copy_to_host_async()
                pre = None
                hint = hints.get(hint_key)
                if hint is not None:
                    pre = mat[:_pad_rows(hint, mat.shape[0])]
                    pre.copy_to_host_async()
                return (mat, cnt, pre, hint_key)
            # one async device->host copy per leaf, all IN FLIGHT AT ONCE:
            # a serial per-leaf np.asarray pays one transfer round-trip per
            # field (~20 fields x 8 chunks through the TPU tunnel dominated
            # the cached forward scan at 26 MB/s first-fetch bandwidth)
            jax.tree.map(lambda a: a.copy_to_host_async()
                         if hasattr(a, "copy_to_host_async") else None,
                         result)
            return result

        def finish(ci, result):
            if compact:
                mat, cnt, pre, hint_key = result
                n = int(cnt)
                if hint_key is not None:
                    while len(hints) >= 4 * max(len(spans), 8):
                        hints.pop(next(iter(hints)))
                    hints[hint_key] = n
                if pre is not None and pre.shape[0] >= n:
                    rows = np.asarray(pre)[:n]
                else:       # no/short hint: count-then-slice fallback
                    rows = np.asarray(mat[:_pad_rows(n, mat.shape[0])])[:n]
                cloud = unpack_compact(rows)
            else:
                cloud = jax.tree.map(np.asarray, result)
            if ckpt is not None:
                ckpt.save_chunk(ci, cloud)
            return ci, cloud

        # Three-stage pipeline (the reference's batch loop is fully
        # synchronous, LiDARSimulation.cpp:316-341): the cull worker
        # prepares chunk i+1 while chunk i runs on the device and chunk
        # i-1's host readback drains on the fetch worker — device->host
        # copies block inside np.asarray (GIL released), so a dedicated
        # thread keeps the main loop dispatching.
        results = {}
        with ThreadPoolExecutor(max_workers=1) as pool, \
                ThreadPoolExecutor(max_workers=1) as fetch_pool:
            fut = pool.submit(prep, spans[0][1], spans[0][2])
            fetches = []
            for k, (ci, lo, hi) in enumerate(spans):
                sl, traverse_data = fut.result()
                if k + 1 < len(spans):   # prefetch the next chunk's cull
                    fut = pool.submit(prep, spans[k + 1][1], spans[k + 1][2])
                if metrics is not None:
                    with metrics.stage("TOTAL") as m:
                        result = self.run_chunk(
                            sl, lo * rays.rays_per_pulse, traverse_data,
                            materials, compact=compact)
                        m["sync"] = result[1] if compact \
                            else result.intensity
                else:
                    result = self.run_chunk(sl, lo * rays.rays_per_pulse,
                                            traverse_data, materials,
                                            compact=compact)
                fetches.append(fetch_pool.submit(
                    finish, ci,
                    start_fetch(result, (run_key, lo, hi)
                                if run_key is not None else None)))
                if len(fetches) > 4:     # bound in-flight device results
                    fetches[len(fetches) - 5].result()
            for f in fetches:
                ci, cloud = f.result()
                results[ci] = cloud
        clouds.extend(results[ci] for ci, _, _ in spans)
        return concat_pointclouds(clouds)

    def coherent_order(self, rays: RayBundle) -> RayBundle:
        return coherent_order(rays)

    def benchmark(self, rays: RayBundle, num_execs: int = 5,
                  discard_first: bool = True, steady_chunks: int = 2):
        """numExecs repetition mode with per-stage mean±std.

        The reference loops `_numExecs` executions with first-run discard
        and brackets each pipeline stage with chrono timers
        (`LiDARSimulation.cpp:292-365`, `PipelineMetrics.h:19-30`).  Under
        XLA, stages inside ONE jit cannot be bracketed, so benchmark mode
        additionally times each stage as its own jitted program
        (FIND_COLLISION / REDUCE / INTENSITY) alongside the fused TOTAL —
        per-stage numbers are slightly pessimistic (fusion across stage
        boundaries is lost) but directly comparable to the reference's.

        Per-stage numbers measure one chunk (the first ``cfg.chunk_pulses``
        pulses).  Additionally ``steady_chunks`` >= 2 chunks run through
        ``run()`` per exec so TRAVERSE_PREP double-buffering and executable
        reuse appear in the report: RUN_FIRST = first full pass (includes
        compile), RUN_STEADY = subsequent passes, RUN_CHUNK_TOTAL /
        RUN_CHUNK_PREP = per-chunk device/prep samples from the steady
        passes.  The report footer adds points/s and chunk counts.
        Returns a populated PipelineMetrics.
        """
        from .metrics import PipelineMetrics
        from ..physics.returns import simulate_returns
        from ..physics.shading import shade_records

        metrics = PipelineMetrics(discard_first=discard_first)
        P = min(self.cfg.chunk_pulses, rays.num_pulses)

        # retraverse scenes (water/bathymetric) re-walk the tree for bounce
        # levels, so the hits-injection REDUCE/INTENSITY split below is only
        # semantically valid on the single-traversal fast path
        retraverse = self.scene_has_water or self.cfg.bathymetric
        stage_returns = jax.jit(
            lambda scene, bvh, mats, rays_, noise, scalars, hits:
            simulate_returns(scene, bvh, mats, rays_, noise, scalars,
                             self.cfg, traverse_fn=lambda o, d: hits,
                             scene_has_water=self.scene_has_water))
        stage_shade = jax.jit(
            lambda scene, mats, records, fo, scalars:
            shade_records(scene, mats, records, fo, scalars, self.cfg,
                          rays.rays_per_pulse))
        traverse_culled = jax.jit(lambda o, d, td: self._culler(o, d, td)) \
            if self._culled_active else None
        from ..geom.packet import intersect_packed_scene, pack_scene
        packed = pack_scene(self.scene, self.bvh)
        traverse_packet = jax.jit(
            lambda o, d: intersect_packed_scene(packed, o, d))

        for _ in range(num_execs):
            with metrics.stage("RAY_BUILDING"):
                if self._culled_active and self.reorder is not False:
                    rs = bsp_order(jax.tree.map(lambda a: a[:P], rays),
                                   self.block_pulses)
                else:
                    rs = jax.tree.map(lambda a: a[:P], rays)
            data = None
            if self._culled_active:
                o_np = np.asarray(rs.origin)
                d_np = np.asarray(rs.direction)
                with metrics.stage("TRAVERSE_PREP"):
                    if self._culler.beams_ok(o_np, d_np):
                        data = self._culler.prepare(self.bvh, o_np, d_np,
                                                    t_max=self._t_max)
            with metrics.stage("FIND_COLLISION") as m:
                if data is not None:
                    hits = traverse_culled(jnp.asarray(rs.origin),
                                           jnp.asarray(rs.direction), data)
                else:
                    hits = traverse_packet(jnp.asarray(rs.origin),
                                           jnp.asarray(rs.direction))
                m["sync"] = hits.t
            if not retraverse:
                with metrics.stage("REDUCE") as m:
                    (records, outliers, num_returns,
                     final_origin) = stage_returns(
                        self.scene, self.bvh, self.materials, rs,
                        self.noise_buf, self.scalars, hits)
                    m["sync"] = records.distance
                from ..physics.returns import final_winner_origins
                fo = final_winner_origins(records, final_origin)
                with metrics.stage("INTENSITY") as m:
                    intensity = stage_shade(self.scene, self.materials,
                                            records, fo, self.scalars)
                    m["sync"] = intensity
            with metrics.stage("TOTAL") as m:
                cloud = self.run_chunk(rs, 0, data)
                m["sync"] = cloud.intensity
            with metrics.stage("READ"):
                jax.tree.map(np.asarray, cloud)

        # ---- steady-state passes over >= 2 chunks through run() ----------
        n_chunks = 0
        n_points = 0
        if steady_chunks and steady_chunks > 1:
            P_run = min(self.cfg.chunk_pulses * steady_chunks,
                        rays.num_pulses)
            rs = jax.tree.map(lambda a: a[:P_run], rays)
            n_chunks = -(-P_run // self.cfg.chunk_pulses)
            cache_prev = self.cache_ladders
            self.cache_ladders = False        # measure real cull every pass
            try:
                for i in range(num_execs):
                    chunk_m = PipelineMetrics()
                    name = "RUN_FIRST" if i == 0 else "RUN_STEADY"
                    with metrics.stage(name):
                        cloud = self.run(rs, metrics=chunk_m)
                    if i > 0:      # per-chunk samples from steady passes
                        metrics.samples["RUN_CHUNK_TOTAL"].extend(
                            chunk_m.samples.get("TOTAL", []))
                        metrics.samples["RUN_CHUNK_PREP"].extend(
                            chunk_m.samples.get("TRAVERSE_PREP", []))
                n_points = int(np.asarray(cloud.mask).sum())
            finally:
                self.cache_ladders = cache_prev
            steady = metrics.samples.get("RUN_STEADY", [])
            if steady:
                pulses_s = P_run / (sum(steady) / len(steady))
                metrics.footer = (
                    f"steady-state: {n_chunks} chunks x "
                    f"{self.cfg.chunk_pulses} pulses, "
                    f"{n_points} points, "
                    f"{pulses_s * rays.rays_per_pulse / 1e6:.2f}M rays/s, "
                    f"{n_points / (sum(steady) / len(steady)) / 1e6:.2f}M "
                    f"points/s (RUN_FIRST includes compile)")
        return metrics

    def _pad_slice(self, rays: RayBundle, lo: int, hi: int,
                   chunk: int) -> RayBundle:
        """Slice [lo, hi) of the pulses, padded to the static chunk shape.

        Padded pulses: origin far outside the scene with zero direction ->
        slab test misses immediately, no hits, masked out naturally (and
        the beam cull ignores zero-direction rays, `tile_beams`)."""
        sl = jax.tree.map(lambda a: np.asarray(a)[lo:hi], rays)
        if hi - lo < chunk:
            pad = chunk - (hi - lo)
            sl = RayBundle(
                origin=np.concatenate(
                    [sl.origin,
                     np.full((pad,) + sl.origin.shape[1:], 1e10,
                             sl.origin.dtype)]),
                direction=np.concatenate(
                    [sl.direction,
                     np.zeros((pad,) + sl.direction.shape[1:],
                              sl.direction.dtype)]),
                gps_time=np.concatenate(
                    [sl.gps_time, np.zeros(pad, sl.gps_time.dtype)]),
            )
        return sl

    def _chunk_key(self, o_np: np.ndarray, d_np: np.ndarray) -> str:
        """Content key of one padded chunk's rays (scene/BVH are bound to
        this Simulator, so the key only needs the ray content).  blake2b
        over the raw bytes runs ~1 GB/s — ~30 ms for a 131k-pulse chunk,
        against seconds of cull it replaces on a hit."""
        import hashlib
        h = hashlib.blake2b(digest_size=16)
        h.update(np.ascontiguousarray(o_np, np.float32).tobytes())
        h.update(np.ascontiguousarray(d_np, np.float32).tobytes())
        h.update(str(self._t_max).encode())
        return h.hexdigest()

    def _ray_key(self, rays: RayBundle) -> str:
        """Content key of a whole (unpermuted) ray bundle.

        Memoized on array identity: hashing a 1M-pulse bundle costs
        0.5-1.5 s on a small host, and repeat scans pass the same arrays.
        (Mutating a ray array IN PLACE between runs would go unnoticed —
        rebuild or copy the bundle instead, as every builder here does.)"""
        memo = self.__dict__.setdefault("_ray_key_memo", {})
        ident = (id(rays.origin), id(rays.direction))
        hit = memo.get(ident)
        if hit is None:
            key = self._chunk_key(np.asarray(rays.origin),
                                  np.asarray(rays.direction))
            while len(memo) >= 8:
                memo.pop(next(iter(memo)))
            # hold the arrays: a live reference pins id() against reuse
            memo[ident] = (key, rays.origin, rays.direction)
        else:
            key = hit[0]
        return key

    def _prep_slice(self, sl: RayBundle, metrics=None, key=None):
        """Host-side beam cull for one padded chunk (worker-thread safe:
        numpy + the native OpenMP culler release the GIL; the jnp.asarray
        device puts in ``prepare`` are thread-safe).

        With ``cache_ladders`` (default), culled ladders/buckets are kept
        DEVICE-RESIDENT keyed on the chunk's ray content: a repeated scan
        (parameter sweeps, wavelength loops, interactive re-runs) skips the
        cull, the candidate packing, and the bucket upload entirely.  The
        reference re-traverses from scratch on every run
        (`LiDARSimulation.cpp:316-341` has no cross-run reuse).
        """
        if not self._culled_active:
            return sl, None
        o_np = np.asarray(sl.origin)
        d_np = np.asarray(sl.direction)
        if not self.cache_ladders:
            key = None
        else:
            if not hasattr(self, "_ladder_cache"):
                self._ladder_cache = {}
            if key is None:     # caller-supplied keys skip the per-chunk hash
                key = self._chunk_key(o_np, d_np)
            hit = self._ladder_cache.get(key)
            if hit is not None:
                return hit
        ctx = metrics.stage("TRAVERSE_PREP") if metrics is not None else None
        if ctx is not None:
            ctx.__enter__()
        try:
            if not self._culler.beams_ok(o_np, d_np):
                data = None   # wide beams (incoherent rays) — packet fallback
            elif _is_pulse_culler(self._culler):
                # bucket-contiguous pulse order: ladder results concatenate
                # on device instead of paying the serialized TPU scatter
                # (`permute_pulse_ladders`); the pulse reorder is absorbed
                # the same way bsp_order is (PointClouds are order-free,
                # noise draws permute with the pulse)
                import jax.numpy as jnp

                from ..kernels.pulse_pallas import (PermutedLayout,
                                                    build_pulse_ladders,
                                                    permute_pulse_ladders)
                R = self._culler.kernel_rays
                o2 = o_np.reshape(-1, 3)
                raw = build_pulse_ladders(self.bvh, o2,
                                          d_np.reshape(-1, 3), R,
                                          t_max=self._t_max)
                perm, layout = permute_pulse_ladders(raw,
                                                     o2.shape[0] // R)
                grp = self._culler.group
                gperm = perm if grp == 1 else (
                    (perm[:, None] * grp
                     + np.arange(grp)[None, :]).reshape(-1))
                sl = jax.tree.map(lambda a: np.asarray(a)[gperm], sl)
                buckets = tuple(
                    tuple(jnp.asarray(a)
                          for a in self._culler._pack_bucket(p, c)[1:])
                    for p, c in raw)
                data = (PermutedLayout(layout), buckets)
            else:
                data = self._culler.prepare(self.bvh, o_np, d_np,
                                            t_max=self._t_max)
            if key is not None and data is not None:
                # device-put the ray slice too: cached repeat scans skip
                # the per-chunk ray upload (~30 MB through the tunnel)
                sl = jax.device_put(sl)
                while len(self._ladder_cache) >= max(self.cache_ladders_max,
                                                     1):
                    self._ladder_cache.pop(next(iter(self._ladder_cache)))
                self._ladder_cache[key] = (sl, data)
            return sl, data
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
