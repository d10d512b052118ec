"""One-shot TPU performance evaluation: traversal variants + full pipeline.

Run on the TPU (default backend).  Prints timing for:
  1. trivial op (device warm-up / session claim)
  2. XLA packet traversal, forward only
  3. Pallas packet traversal, forward only
  4. full simulate_chunk forward
  5. full forward+backward (bench headline)

Usage: python scripts/tpu_eval.py [pulses] [rays_per_pulse]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    pulses = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rpp = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    def timed(name, fn, *args, iters=5, sync=None):
        # device-resident args: numpy inputs would re-upload through the
        # TPU tunnel on every call and dominate the measurement
        args = jax.device_put(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} compile+1st {t_compile:8.2f}s   "
              f"per-iter {dt*1e3:9.2f} ms", flush=True)
        return dt

    t0 = time.perf_counter()
    x = (jnp.arange(1024.0) * 2).sum()
    x.block_until_ready()
    print(f"warm-up op: {time.perf_counter()-t0:.1f}s  backend="
          f"{jax.default_backend()}", flush=True)

    from bench import build_workload
    from lidar_brdf_tpu.geom.packet import intersect_packed_scene, pack_scene
    from lidar_brdf_tpu.kernels.traverse_pallas import PallasCulledTraverser
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk

    t0 = time.perf_counter()
    scene, bvh, cfg, rays, materials, scalars, noise = build_workload(
        pulses, rpp)
    print(f"workload: {time.perf_counter()-t0:.1f}s "
          f"({scene.num_faces} faces, {pulses}x{rpp} rays)", flush=True)
    n_rays = pulses * rpp

    # 2. XLA packet traversal
    packed = pack_scene(jax.tree.map(jnp.asarray, scene),
                        jax.tree.map(jnp.asarray, bvh))
    o = jnp.asarray(rays.origin)
    d = jnp.asarray(rays.direction)
    xla_t = timed("XLA packet traverse",
                  jax.jit(lambda o, d: intersect_packed_scene(
                      packed, o, d).t), o, d)
    print(f"  -> {n_rays/xla_t/1e6:.2f} M rays/s", flush=True)

    # 3. Pallas beam-culled traversal
    try:
        from lidar_brdf_tpu.runtime.simulate import bsp_order
        r_ord = bsp_order(rays, block_pulses=max(1, 640 // rpp))
        o = jnp.asarray(r_ord.origin)
        d = jnp.asarray(r_ord.direction)
        trav = PallasCulledTraverser(scene, tile_rays=640)
        data = jax.device_put(trav.prepare(
            bvh, np.asarray(r_ord.origin), np.asarray(r_ord.direction),
            t_max=float(cfg.max_range) * 1.2))
        pl_t = timed("Pallas culled traverse",
                     jax.jit(lambda o, d: trav(o, d, data).t), o, d)
        print(f"  -> {n_rays/pl_t/1e6:.2f} M rays/s", flush=True)
        rays = r_ord
    except Exception as e:  # noqa: BLE001
        print("Pallas traversal FAILED:", repr(e)[:500], flush=True)
        trav = None
        data = None

    # 4. full forward
    fwd = jax.jit(functools.partial(simulate_chunk, cfg=cfg,
                                    scene_has_water=False))
    f_t = timed("simulate_chunk fwd (XLA)", fwd,
                scene, bvh, materials, rays, noise, scalars)
    print(f"  -> {n_rays/f_t/1e6:.2f} M rays/s", flush=True)

    if trav is not None:
        fwd_p = jax.jit(functools.partial(
            simulate_chunk, cfg=cfg, scene_has_water=False,
            traverse_fn=trav, traverse_data=data))
        fp_t = timed("simulate_chunk fwd (Pallas)", fwd_p,
                     scene, bvh, materials, rays, noise, scalars)
        print(f"  -> {n_rays/fp_t/1e6:.2f} M rays/s", flush=True)

    # 5. fwd+bwd
    def loss_fn(table, scene, bvh, materials, rays, noise, scalars):
        mats = materials.__class__(**{**materials.__dict__,
                                      "brdf_table": table})
        cloud = simulate_chunk(scene, bvh, mats, rays, noise, scalars, cfg,
                               scene_has_water=False)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))

    fb = jax.jit(jax.value_and_grad(loss_fn))
    fb_t = timed("fwd+bwd (XLA)", fb, jnp.asarray(materials.brdf_table),
                 scene, bvh, materials, rays, noise, scalars)
    print(f"  -> {n_rays/fb_t/1e6:.2f} M rays/s fwd+bwd", flush=True)


if __name__ == "__main__":
    import faulthandler
    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    main()
