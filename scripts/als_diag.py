"""Diagnose beam-cull bucket quality on the ALS 5M-triangle bench workload."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

import bench

num_pulses = int(os.environ.get("DIAG_PULSES", 32768))
t0 = time.perf_counter()
scene, bvh, cfg, rays, materials, scalars, noise = bench.build_workload(
    "als", num_pulses, 10, 2, "terrain",
    int(os.environ.get("DIAG_TRIS", 5_000_000)))
print(f"workload: {time.perf_counter()-t0:.1f}s, faces={scene.num_faces}")

from lidar_brdf_tpu.runtime.simulate import bsp_order
from lidar_brdf_tpu.geom import beamcull

rays_pp = rays.rays_per_pulse
block_pulses = max(1, 640 // rays_pp)
rays = bsp_order(rays, block_pulses)
tile_rays = block_pulses * rays_pp
o = np.asarray(rays.origin).reshape(-1, 3)
d = np.asarray(rays.direction).reshape(-1, 3)

t0 = time.perf_counter()
beams = beamcull.tile_beams(o, d, tile_rays)
print(f"tiles={beams.center.shape[0]} beams={time.perf_counter()-t0:.1f}s")
ang = np.degrees(np.arccos(np.clip(beams.cos_half[beams.valid], -1, 1)))
print(f"cone half-angle deg: mean={ang.mean():.2f} p50={np.percentile(ang,50):.2f} "
      f"p95={np.percentile(ang,95):.2f} max={ang.max():.2f}")
print(f"origin radius m: mean={beams.radius[beams.valid].mean():.1f} "
      f"max={beams.radius[beams.valid].max():.1f}")

t0 = time.perf_counter()
t_max = float(cfg.max_range) * 1.2
tiles, faces, counts = beamcull._collect_candidates(bvh, beams, t_max)
print(f"cull: {time.perf_counter()-t0:.1f}s")
print(f"candidates/tile: mean={counts.mean():.0f} p50={np.percentile(counts,50):.0f} "
      f"p95={np.percentile(counts,95):.0f} max={counts.max()}")
print(f"total pairs = {int(counts.sum()) * tile_rays / 1e9:.2f}G ray-tri tests "
      f"({counts.sum()/1e6:.1f}M tile-face pairs)")

buckets = beamcull.build_bucketed_candidates(
    bvh, o, d, tile_rays=tile_rays, t_max=t_max)
tot = 0
for tidx, cand in buckets:
    pairs = cand.shape[0] * cand.shape[1] * tile_rays
    tot += pairs
    print(f"  bucket C={cand.shape[1]:6d}  tiles={cand.shape[0]:5d} "
          f"padded-pairs={pairs/1e9:.2f}G")
print(f"padded total = {tot/1e9:.2f}G ray-tri tests")
