"""Profile the headline bench workload: traverse vs forward vs fwd+bwd.

Splits the steady-state step time of the bench.py TLS workload into
  1. traversal only (Pallas tile kernel -> Hit)
  2. full forward simulate_chunk
  3. fwd+bwd (value_and_grad of intensity sum wrt BRDF table)
Each measured with bench.py's in-jit fori_loop methodology (one dispatch,
serially-chained carries).  Prints a JSON dict of per-step milliseconds.

Usage:  python scripts/profile_stages.py          # TLS config on TPU
        BENCH_CONFIG=multireturn python scripts/profile_stages.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    config = os.environ.get("BENCH_CONFIG", "tls")
    spec = bench.CONFIGS[config]
    import jax
    import jax.numpy as jnp
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk

    iters = int(os.environ.get("BENCH_ITERS", 10))

    t0 = time.perf_counter()
    (scene, bvh, cfg, rays, materials, scalars, noise, traverser, buckets,
     total_rays) = bench.load_workload(config, spec)
    print(f"# built in {time.perf_counter()-t0:.1f}s; {total_rays} rays",
          file=sys.stderr, flush=True)

    args = jax.device_put((materials.brdf_table, scene, bvh, materials,
                           rays, noise, scalars, buckets))
    (table, scene_d, bvh_d, mats_d, rays_d, noise_d, scalars_d,
     buckets_d) = args

    def timed(name, step_fn, init_carry):
        """fori_loop-chained steps inside one jit; returns ms/step."""
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, iters, step_fn, carry)
        out = jax.block_until_ready(run(init_carry))   # compile + warm
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"# {name}: {dt*1e3:.2f} ms/step "
              f"({total_rays/dt/1e6:.1f}M rays/s)", file=sys.stderr,
              flush=True)
        return dt * 1e3

    results = {"config": config, "rays": total_rays, "iters": iters}

    # 1. traversal only
    def trav_step(_, carry):
        origin, acc = carry
        hit = traverser(origin, rays_d.direction, buckets_d)
        s = jnp.sum(jnp.where(hit.face >= 0, hit.t, 0.0))
        return (origin + 1e-30 * s, acc + s)
    results["traverse_ms"] = timed(
        "traverse", trav_step,
        (rays_d.origin, jnp.zeros((), jnp.float32)))

    # 2. full forward
    def fwd_step(_, carry):
        origin, acc = carry
        r = rays_d.__class__(origin=origin, direction=rays_d.direction,
                             gps_time=rays_d.gps_time)
        cloud = simulate_chunk(scene_d, bvh_d, mats_d, r, noise_d, scalars_d,
                               cfg, scene_has_water=False,
                               traverse_fn=traverser, traverse_data=buckets_d)
        s = jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))
        return (origin + 1e-30 * s, acc + s)
    results["forward_ms"] = timed(
        "forward", fwd_step, (rays_d.origin, jnp.zeros((), jnp.float32)))

    # 3. fwd+bwd
    def loss_fn(t, origin):
        mats = mats_d.__class__(**{**mats_d.__dict__, "brdf_table": t})
        r = rays_d.__class__(origin=origin, direction=rays_d.direction,
                             gps_time=rays_d.gps_time)
        cloud = simulate_chunk(scene_d, bvh_d, mats, r, noise_d, scalars_d,
                               cfg, scene_has_water=False,
                               traverse_fn=traverser, traverse_data=buckets_d)
        return jnp.sum(jnp.where(cloud.mask, cloud.intensity, 0.0))
    grad_fn = jax.value_and_grad(loss_fn)

    def fb_step(_, carry):
        t, origin, acc = carry
        loss, g = grad_fn(t, origin)
        return (t + 1e-30 * g, origin + 1e-30 * loss, acc + loss)
    results["fwd_bwd_ms"] = timed(
        "fwd+bwd", fb_step, (table, rays_d.origin, jnp.zeros((), jnp.float32)))

    results["shading_fwd_ms"] = results["forward_ms"] - results["traverse_ms"]
    results["bwd_ms"] = results["fwd_bwd_ms"] - results["forward_ms"]
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
