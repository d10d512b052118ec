"""Benchmark: rays/s through the full forward+backward simulation step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >100M rays/s fwd+bwd on a v5e-8, i.e. 12.5M
rays/s/chip; vs_baseline is measured rays/s/chip over that per-chip target.
Workload: TLS scan over a procedural terrain+boxes scene, measured-table
BRDF shading, loss = sum of intensities, gradients w.r.t. BRDF tables —
the reference's default TLS shape scaled up (SURVEY.md §6).
"""

import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 100e6 / 8.0


def build_workload(num_pulses, rays_per_pulse, num_tris_target=40_000):
    """Build scene/rays/materials on the CPU backend (host), as numpy.

    Keeps the TPU compile surface to exactly one program (the fwd+bwd step):
    ray generation and noise fill run on the local CPU backend.
    """
    import jax
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import LiDARType, SensorConfig, ShadingMode
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.utils import noise as noise_mod

    rng = np.random.default_rng(0)
    # ground + buildings on a jittered grid (12 tris/building)
    num_buildings = max((num_tris_target - 128) // 12, 1)
    scene = synthetic.city_scene(rng, num_buildings=num_buildings)
    bvh = build_scene_bvh(scene)
    vres = 64
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 10.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=100.0,
        tls_middle_angle_vertical=-35.0,
        tls_resolution_horizontal=num_pulses // vres,
        tls_resolution_vertical=vres,
        rays_per_pulse=rays_per_pulse, max_returns=1,
        chunk_pulses=num_pulses,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rays = build_rays(cfg, scene)
        noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
        scalars = SimScalars.from_config(cfg, 0.0)
    to_np = lambda t: jax.tree.map(np.asarray, t)
    materials = MaterialLibrary.default().table_at(1064)
    return (scene, bvh, cfg, to_np(rays), materials, to_np(scalars),
            np.asarray(noise))


def main():
    import faulthandler
    import threading
    faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

    # Last-resort watchdog: if the TPU tunnel wedges (compiles hang), still
    # emit a well-formed result line before the driver's timeout.
    def _watchdog():
        print(json.dumps({
            "metric": "rays_per_s_fwd_bwd_per_chip", "value": 0.0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "note": "tpu-unavailable: compile/execute did not finish"}),
            flush=True)
        os._exit(3)
    wd = threading.Timer(float(os.environ.get("BENCH_WATCHDOG_S", 2400)),
                         _watchdog)
    wd.daemon = True
    wd.start()
    import jax
    import jax.numpy as jnp
    from lidar_brdf_tpu.kernels.traverse_pallas import PallasCulledTraverser
    from lidar_brdf_tpu.runtime.simulate import bsp_order, simulate_chunk

    num_pulses = int(os.environ.get("BENCH_PULSES", 131072))
    rays_per_pulse = int(os.environ.get("BENCH_RAYS_PULSE", 10))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    t_start = time.perf_counter()
    scene, bvh, cfg, rays, materials, scalars, noise = build_workload(
        num_pulses, rays_per_pulse)
    # Beam-culled traversal prep (host, once per scan — reused every step):
    # BSP-order pulses into coherent tiles, collect per-tile candidates.
    block_pulses = max(1, 640 // rays_per_pulse)
    rays = bsp_order(rays, block_pulses)
    traverser = PallasCulledTraverser(
        scene, tile_rays=block_pulses * rays_per_pulse,
        interpret=jax.default_backend() == "cpu")
    buckets = traverser.prepare(
        bvh, np.asarray(rays.origin), np.asarray(rays.direction),
        t_max=float(cfg.max_range) * 1.2)
    print(f"# workload built in {time.perf_counter()-t_start:.1f}s "
          f"({scene.num_faces} faces)", file=sys.stderr, flush=True)
    total_rays = rays.num_pulses * rays.rays_per_pulse

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
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
