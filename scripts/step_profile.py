"""Per-op profile of the bench training step on the real TPU.

Reuses bench.py's workload/step construction (BENCH_CONFIG / BENCH_GRADS /
BENCH_STATE_CACHE env vars apply), traces a few steps with jax.profiler,
then parses the captured xplane protobuf and prints device-time by op,
aggregated over HLO op categories and individual ops.

Usage:
  BENCH_CONFIG=als BENCH_STATE_CACHE=/tmp/als_state.pkl \
      python scripts/step_profile.py
"""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import bench


def build_step():
    config = os.environ.get("BENCH_CONFIG", "als")
    spec = bench.CONFIGS[config]
    (scene, bvh, cfg, rays, materials, scalars, noise, traverser, buckets,
     total_rays, vg_aux) = bench.load_workload(config, spec)
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk

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

    sub_fns = [make_sub_loss(t) for t in travs]

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

    grad_sel = os.environ.get("BENCH_GRADS", "full")
    argnums = {"table": (0,), "table+origin": (0, 1),
               "full": (0, 1, 2)}[grad_sel]
    grad_fn = jax.value_and_grad(loss_fn, argnums=argnums)

    args = jax.device_put((materials.brdf_table, scene, bvh, materials,
                           rays, noise, scalars, buckets, vg_aux))

    def train_steps(n, table, *rest):
        def body(_, carry):
            t, origin, verts, acc = carry
            loss, gs = grad_fn(t, origin, verts, *rest)
            gt = gs[0]
            go = gs[1] if len(gs) > 1 else loss
            gv = gs[2] if len(gs) > 2 else loss
            return (t + 1e-30 * gt, origin + 1e-30 * go,
                    verts + 1e-30 * gv, acc + loss)
        scene_, rays_ = rest[0], rest[3]
        return jax.lax.fori_loop(
            0, n, body,
            (table, rays_.origin, scene_.vertices, jnp.float32(0.0)))

    stepper = jax.jit(train_steps)
    return stepper, args, total_rays


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb captured", file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as fh:
        xspace.ParseFromString(fh.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        dur_by_name = defaultdict(float)
        cnt_by_name = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            lname = line.name
            # XLA op lines carry per-HLO events; step lines etc. skipped
            if "XLA Ops" not in lname and "Ops" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                dur_by_name[name] += dur
                cnt_by_name[name] += 1
                total += dur
        if not dur_by_name:
            continue
        print(f"\n=== plane: {plane.name} (total op time {total:.3f}s) ===")
        # aggregate by fusion-category prefix
        cat = defaultdict(float)
        for name, d in dur_by_name.items():
            key = name.split(".")[0].rstrip("0123456789")
            cat[key] += d
        print("-- by category --")
        for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {v*1e3:10.2f} ms  {100*v/total:5.1f}%  {k}")
        print("-- top ops --")
        for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {d*1e3:10.2f} ms  x{cnt_by_name[name]:<4d} {name[:110]}")


def main():
    os.environ.setdefault("BENCH_STATE_CACHE", "/tmp/als_state.pkl")
    stepper, args, total_rays = build_step()
    t0 = time.perf_counter()
    out = stepper(1, *args)
    _ = float(out[-1])
    print(f"# compile+first step {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    iters = int(os.environ.get("PROFILE_ITERS", 3))
    logdir = os.environ.get("PROFILE_DIR", "/tmp/jax_trace")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        out = stepper(iters, *args)
        _ = float(out[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"# traced {iters} steps, {dt:.3f}s/step "
          f"({total_rays/dt/1e6:.2f}M rays/s)", file=sys.stderr, flush=True)
    parse_xplane(logdir)


if __name__ == "__main__":
    main()
