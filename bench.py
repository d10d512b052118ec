"""Benchmark: rays/s through the full forward+backward simulation step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >100M rays/s fwd+bwd on a v5e-8, i.e. 12.5M
rays/s/chip; vs_baseline is measured rays/s/chip over that per-chip target.

Workloads (select with BENCH_CONFIG):
  tls          (default) BASELINE-shape TLS scan: 131k pulses x 10 rays,
               40k-face city scene, measured-table BRDF, single return.
  multireturn  BASELINE config 3: footprint supersampling + multi-return
               extraction, >=1M beams (1.05M pulses x 10 rays, 2 returns).
  als          BASELINE config 4: ALS zigzag flight over a ~5M-triangle
               displaced terrain.
  alphaprime   the largest reference sensor preset (AlphaPrime,
               LiDARParameters.h:454-469): 3600x364 pulses x 10 rays
               = 13.1M rays/scan, 2 returns.
All run the same fwd+bwd inverse-rendering loop (loss -> BRDF-table grads).
Results for non-default configs are also appended to BENCH_EXTRA.json.
"""

import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 100e6 / 8.0

# traverser choice per config (measured on v5e, 2026-08): dense pulse
# grids over SMALL scenes run fastest on the shared-candidate tile kernel
# (per-pulse ladders duplicate Wald rows per pulse -> HBM-bound at ~1M
# pulses x 40k faces: 15.1 vs 18.1 M rays/s); wide-area scans over LARGE
# scenes need the per-pulse ladders (tile footprints on the 5M-face
# terrain hold ~3k candidates: 0.31 vs 17.5 M rays/s).
CONFIGS = {
    "tls": dict(pulses=131072, rays_pulse=10, max_returns=1, scene="city",
                num_tris=40_000, traverser="tile"),
    "multireturn": dict(pulses=1_048_576, rays_pulse=10, max_returns=2,
                        scene="city", num_tris=40_000, traverser="tile"),
    "als": dict(pulses=131072, rays_pulse=10, max_returns=2,
                scene="terrain", num_tris=5_000_000, traverser="pulse"),
    "alphaprime": dict(pulses=3600 * 364, rays_pulse=10, max_returns=2,
                       scene="city", num_tris=40_000, traverser="tile"),
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
    rays = bsp_order(rays, block_pulses)
    kind = os.environ.get("BENCH_TRAVERSER", spec["traverser"])
    t_max = float(cfg.max_range) * 1.2
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    if kind == "tile":
        from lidar_brdf_tpu.kernels.traverse_pallas import \
            PallasCulledTraverser
        tr = PallasCulledTraverser(
            scene, tile_rays=block_pulses * rays_per_pulse, interpret=True)
        raw = tr.build_buckets(bvh, o, d, t_max=t_max)
    else:
        from lidar_brdf_tpu.kernels.pulse_pallas import build_pulse_ladders
        raw = build_pulse_ladders(bvh, o, d, rays_per_pulse, t_max=t_max)
    to_np = lambda t: jax.tree.map(np.asarray, t)
    return dict(scene=to_np(scene), bvh=to_np(bvh), cfg=cfg,
                rays=to_np(rays), materials=to_np(materials),
                scalars=to_np(scalars), noise=np.asarray(noise),
                raw_buckets=raw, t_max=t_max, kind=kind,
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

    if os.environ.get("BENCH_INLINE_BUILD") or \
            jax.default_backend() == "cpu":
        state = _build_host_state(config, spec)
    else:
        fd, path = tempfile.mkstemp(suffix=".pkl")
        os.close(fd)
        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--dump-workload", path],
                check=True, env=dict(os.environ, BENCH_CONFIG=config))
            with open(path, "rb") as fh:
                state = pickle.load(fh)
        finally:
            os.unlink(path)

    scene, bvh, cfg, rays = (state["scene"], state["bvh"], state["cfg"],
                             state["rays"])
    interpret = jax.default_backend() == "cpu"
    if state["kind"] == "tile":
        from lidar_brdf_tpu.kernels.traverse_pallas import \
            PallasCulledTraverser
        traverser = PallasCulledTraverser(
            scene,
            tile_rays=state["block_pulses"] * state["rays_per_pulse"],
            interpret=interpret)
        buckets = traverser.pack_buckets(
            bvh, state["raw_buckets"], np.asarray(rays.origin),
            np.asarray(rays.direction), state["t_max"])
    else:
        import jax.numpy as jnp

        from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
        traverser = PulseLadderTraverser(
            scene, rays_per_pulse=state["rays_per_pulse"],
            interpret=interpret)
        traverser.t_max = state["t_max"]
        buckets = tuple(
            tuple(jnp.asarray(a) for a in traverser._pack_bucket(p, c))
            for p, c in state["raw_buckets"])
    total_rays = rays.num_pulses * rays.rays_per_pulse
    return (scene, bvh, cfg, rays, state["materials"], state["scalars"],
            state["noise"], traverser, buckets, total_rays)


def main():
    import faulthandler
    import threading
    faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

    config = os.environ.get("BENCH_CONFIG", "tls")
    spec = CONFIGS[config]
    metric = ("rays_per_s_fwd_bwd_per_chip" if config == "tls"
              else f"rays_per_s_fwd_bwd_per_chip_{config}")

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
    import jax.numpy as jnp
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk

    iters = int(os.environ.get("BENCH_ITERS", 10))

    t_start = time.perf_counter()
    (scene, bvh, cfg, rays, materials, scalars, noise, traverser, buckets,
     total_rays) = load_workload(config, spec)
    print(f"# [{config}] workload built in {time.perf_counter()-t_start:.1f}s "
          f"({scene.num_faces} faces, {rays.num_pulses} pulses x "
          f"{rays.rays_per_pulse} rays, {cfg.max_returns} returns)",
          file=sys.stderr, flush=True)

    def loss_fn(table, origin, scene, bvh, materials, rays, noise, scalars,
                buckets):
        mats = materials.__class__(**{**materials.__dict__,
                                      "brdf_table": table})
        rays = rays.__class__(origin=origin, direction=rays.direction,
                              gps_time=rays.gps_time)
        cloud = simulate_chunk(scene, bvh, mats, rays, noise, scalars, cfg,
                               scene_has_water=False, traverse_fn=traverser,
                               traverse_data=buckets)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    grad_fn = jax.value_and_grad(loss_fn)

    # device-resident args: steady-state training steps do not re-upload
    # the scene/rays every iteration (host->device transfer is not the
    # metric — the reference's timing harness also excludes uploads,
    # `PipelineMetrics` brackets kernels only, LiDARSimulation.cpp:479-611)
    args = jax.device_put((materials.brdf_table, scene, bvh, materials,
                           rays, noise, scalars, buckets))

    # The timing loop lives INSIDE one jit: a fori_loop whose carry chains
    # the gradient back into the table.  One dispatch, one host round-trip,
    # serially-dependent steps — immune to host/tunnel dispatch latency and
    # to async-readiness misreporting (both observed through the TPU
    # tunnel), and it is exactly a steady-state inverse-rendering loop.
    def train_steps(n, table, *rest):
        def body(_, carry):
            t, origin, acc = carry
            loss, g = grad_fn(t, origin, *rest)
            # 1e-30 (not 0.0): keeps the gradient live through XLA's
            # algebraic simplifier while leaving the values numerically
            # unchanged (f32 underflow).  Chaining the ray origins into the
            # carry keeps the traversal INSIDE the loop — otherwise XLA
            # hoists everything that does not depend on the table and the
            # loop only measures shading.
            return (t + 1e-30 * g, origin + 1e-30 * loss, acc + loss)
        rays_ = rest[3]
        return jax.lax.fori_loop(
            0, n, body, (table, rays_.origin, jnp.float32(0.0)))

    stepper = jax.jit(train_steps)   # n dynamic: one compile for any iters

    # warm-up / compile
    t0 = time.perf_counter()
    *_, warm = stepper(1, *args)
    _ = float(warm)
    print(f"# compile+first step {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    *_, acc = stepper(iters, *args)
    _ = float(acc)            # value fetch forces completion
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = total_rays / dt
    line = {
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / PER_CHIP_TARGET, 4),
    }
    print(json.dumps(line))
    if config != "tls":
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_EXTRA.json")
        extra = {}
        if os.path.exists(path):
            with open(path) as fh:
                extra = json.load(fh)
        extra[config] = dict(line, pulses=rays.num_pulses,
                             rays_per_pulse=rays.rays_per_pulse,
                             max_returns=cfg.max_returns,
                             faces=scene.num_faces,
                             device=jax.devices()[0].device_kind)
        with open(path, "w") as fh:
            json.dump(extra, fh, indent=1)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--dump-workload":
        _dump_workload(sys.argv[2])
        sys.exit(0)
    sys.exit(main())
