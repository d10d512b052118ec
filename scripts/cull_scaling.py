"""Thread-scaling measurement of the native OpenMP beam culler.

VERDICT r03 item 4a: the forward-end-to-end note claims the 2-vCPU host is
the bottleneck — substantiate it with an OMP_NUM_THREADS scaling curve and
a single-thread ms/tile figure a reader can extrapolate to a real TPU host
VM (100+ cores).

Runs the exact host cull of the forward bench chunk (131072 pulses x
rays_per_pulse rays over the 40k-face city scene) at 1 and 2 threads
(nproc here is 2) and prints a JSON dict:

    python scripts/cull_scaling.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import LiDARType, SensorConfig
    from lidar_brdf_tpu.geom.beamcull import (_collect_candidates,
                                              tile_beams)
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io import native as native_mod
    from lidar_brdf_tpu.runtime.simulate import bsp_order

    pulses = int(os.environ.get("CULL_PULSES", 131072))
    rpp = int(os.environ.get("CULL_RAYS_PULSE", 10))
    reps = int(os.environ.get("CULL_REPS", 3))

    rng = np.random.default_rng(0)
    scene = synthetic.city_scene(rng, num_buildings=(40_000 - 128) // 12)
    bvh = build_scene_bvh(scene)
    vres = 64
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 10.0, 0.0), tls_fov_horizontal=360.0,
        tls_fov_vertical=100.0, tls_middle_angle_vertical=-35.0,
        tls_resolution_horizontal=pulses // vres,
        tls_resolution_vertical=vres,
        rays_per_pulse=rpp, chunk_pulses=pulses)
    rays = build_rays(cfg, scene)
    rays = jax.tree.map(lambda a: np.asarray(a)[:pulses], rays)
    block_pulses = max(1, 640 // rpp)
    rays = bsp_order(rays, block_pulses)
    tile_rays = block_pulses * rpp
    o = np.asarray(rays.origin, np.float32).reshape(-1, 3)
    d = np.asarray(rays.direction, np.float32).reshape(-1, 3)
    beams = tile_beams(o, d, tile_rays)
    n_tiles = beams.center.shape[0]
    t_max = float(cfg.max_range) * 1.2

    if native_mod.get_lib() is None:
        print(json.dumps({"error": "native culler unavailable"}))
        return 1

    results = {"pulses": pulses, "rays_per_pulse": rpp, "tiles": n_tiles,
               "tile_rays": tile_rays, "faces": int(scene.num_faces),
               "nproc": os.cpu_count()}
    import lidar_brdf_tpu.io.native as nat

    for threads in (1, 2, os.cpu_count()):
        if f"threads_{threads}" in results:
            continue
        os.environ["OMP_NUM_THREADS"] = str(threads)
        # the lib reads OMP_NUM_THREADS via omp at call time only if
        # omp_set_num_threads wasn't called; use the env through a fresh
        # omp call path (num_threads is read per parallel region)
        try:
            import ctypes
            ctypes.CDLL("libgomp.so.1").omp_set_num_threads(threads)
        except OSError:
            pass
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            tiles, faces_out, counts = _collect_candidates(bvh, beams, t_max)
            best = min(best, time.perf_counter() - t0)
        results[f"threads_{threads}"] = {
            "cull_s": round(best, 3),
            "ms_per_tile": round(best / max(n_tiles, 1) * 1e3, 4),
            "candidates": int(counts.sum()),
        }
    t1 = results["threads_1"]["cull_s"]
    tn = results[f"threads_{os.cpu_count()}"]["cull_s"]
    results["speedup_at_nproc"] = round(t1 / tn, 2)
    # extrapolation a reader can check: embarrassingly parallel over tiles
    results["projected_s_96_cores"] = round(t1 / 96, 3)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
