"""Multi-chip scaling evidence (the BASELINE.json distributed deliverable).

Real multi-chip hardware is not reachable from this environment (one v5e
chip through a tunnel), so this script produces the three artifacts that
together back the >=85% scaling claim, instead of a meaningless virtual
"efficiency" headline:

1. ``analysis`` — a per-step collective-cost model built from MEASURED
   single-chip step times (BENCH_r*.json / BENCH_EXTRA.json, or measured
   inline with SCALING_MEASURE=1) and the exact gradient byte counts this
   framework psum-reduces per step (BRDF table + scene vertices; ray-pose
   gradients are sharded with the rays and never cross chips,
   `parallel/shard.py:170-230`).  ICI/DCN bandwidth assumptions are stated
   inline and conservative (single-link, one-way).  This is labeled an
   analysis — it is arithmetic anyone can check, not a measurement of a
   pod.
2. ``virtual_check`` — an 8-way virtual CPU-device run of the REAL sharded
   train step, sized so compute dominates partitioning overhead
   (>=256k pulses/device).  It validates correctness + SPMD overhead of
   the collective program; it is NOT a hardware scaling number (all
   virtual devices share this host's physical cores) and is labeled so.
3. ``scripts/pod_scaling.md`` — the runbook to reproduce the true curve on
   a real v5e pod slice (this script, SCALING_BACKEND=native, under
   `jax.distributed`).

Usage:
    python bench_scaling.py                    # analysis + virtual check
    SCALING_MODE=analysis python bench_scaling.py
    SCALING_BACKEND=native python bench_scaling.py   # on a real slice
"""

import json
import os
import time

PULSES_PER_DEVICE = int(os.environ.get("SCALING_PULSES_PER_DEVICE", 262144))
RAYS_PER_PULSE = int(os.environ.get("SCALING_RAYS_PER_PULSE", 2))
ITERS = int(os.environ.get("SCALING_ITERS", 3))
BACKEND = os.environ.get("SCALING_BACKEND", "cpu-virtual")
MODE = os.environ.get("SCALING_MODE", "both")

if BACKEND == "cpu-virtual":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                    # noqa: E402

if BACKEND == "cpu-virtual":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from lidar_brdf_tpu.api import build_scene_bvh                # noqa: E402
from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,  # noqa: E402
                                        ShadingMode)
from lidar_brdf_tpu.core.types import RayBundle               # noqa: E402
from lidar_brdf_tpu.io import synthetic                       # noqa: E402
from lidar_brdf_tpu.io.materials import MaterialLibrary       # noqa: E402
from lidar_brdf_tpu.parallel import shard as shard_mod        # noqa: E402
from lidar_brdf_tpu.physics.returns import SimScalars         # noqa: E402
from lidar_brdf_tpu.utils import noise as noise_mod           # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))

# --- bandwidth assumptions (stated, conservative) --------------------------
# v5e ICI: 4.5e10 B/s per link one-way (public "How to Scale Your Model"
# hardware table); we model a 1-D bidirectional ring all-reduce as
# 2*B/W_link (reduce-scatter + all-gather), IGNORING the second torus axis
# and the second ring direction — so the real pod does better.
ICI_LINK_BYTES_S = 4.5e10
# cross-host (2 hosts over DCN): 100 Gbit/s NIC per host, one-way.
DCN_HOST_BYTES_S = 12.5e9


def _psum_bytes(config: str) -> dict:
    """Exact per-step all-reduced gradient bytes for a bench config.

    What crosses chips per train step is the gradient of every REPLICATED
    differentiable parameter: the BRDF table and the scene vertices (plus
    the handful of SimScalars, negligible).  Ray origins/pose gradients are
    sharded with the rays (`P(RAY_AXIS)`) — zero cross-chip bytes.
    """
    mats = MaterialLibrary.default().table_at(1064)
    table_b = int(np.prod(mats.brdf_table.shape)) * 4
    if config == "als":
        # rough_terrain(num_tris=5M): g=ceil(sqrt(F/2)) grid -> (g+1)^2 verts
        g = int(np.ceil(np.sqrt(5_000_000 / 2)))
        verts = (g + 1) ** 2
    else:
        # city_scene(40k faces): measured vertex count
        rng = np.random.default_rng(0)
        scene = synthetic.city_scene(rng, num_buildings=(40_000 - 128) // 12)
        verts = int(scene.num_vertices)
    vert_b = verts * 3 * 4
    return {"brdf_table_bytes": table_b, "vertex_grad_bytes": vert_b,
            "total_psum_bytes": table_b + vert_b, "vertices": verts}


def _measured_step(config: str) -> dict | None:
    """Single-chip step time from the most recent bench artifacts."""
    if config == "tls":
        # newest driver-captured round record wins
        for name in sorted((n for n in os.listdir(REPO)
                            if n.startswith("BENCH_r")
                            and n.endswith(".json")), reverse=True):
            with open(os.path.join(REPO, name)) as fh:
                data = json.load(fh)
            parsed = data.get("parsed") or {}
            if parsed.get("value"):
                # default TLS workload: 131072 pulses x 10 rays
                rays = 131072 * 10
                return {"rays": rays, "rays_per_s": parsed["value"],
                        "step_s": rays / parsed["value"], "source": name}
    path = os.path.join(REPO, "BENCH_EXTRA.json")
    if os.path.exists(path):
        with open(path) as fh:
            extra = json.load(fh)
        if config in extra and extra[config].get("value"):
            e = extra[config]
            rays = e["pulses"] * e["rays_per_pulse"]
            return {"rays": rays, "rays_per_s": e["value"],
                    "step_s": rays / e["value"], "source": "BENCH_EXTRA.json"}
    return None


def analysis() -> dict:
    """Collective-cost model for 2/4/8 chips (ICI) and 2 hosts (DCN)."""
    out = {"kind": "analysis",
           "note": ("computed from measured single-chip step times and "
                    "exact psum byte counts; ring all-reduce modeled as "
                    "2*B/W on ONE link ONE way (conservative: ignores the "
                    "second torus axis and ring direction)"),
           "ici_link_bytes_s": ICI_LINK_BYTES_S,
           "dcn_host_bytes_s": DCN_HOST_BYTES_S,
           "configs": {}}
    for config in ("tls", "als"):
        meas = _measured_step(config)
        if meas is None:
            continue
        grads = _psum_bytes(config)
        B = grads["total_psum_bytes"]
        t_step = meas["step_s"]
        t_ici = 2.0 * B / ICI_LINK_BYTES_S
        t_dcn = 2.0 * B / DCN_HOST_BYTES_S
        # weak scaling: per-chip work constant, all-reduce added on top.
        # XLA overlaps the psum with the backward pass; the *bound* below
        # assumes NO overlap (serial add) and still clears 85%.
        eff_ici = t_step / (t_step + t_ici)
        eff_dcn = t_step / (t_step + t_dcn)
        out["configs"][config] = {
            "measured_step_s_per_chip": round(t_step, 5),
            "measured_source": meas["source"],
            "rays_per_step_per_chip": meas["rays"],
            "psum_bytes_per_step": grads,
            "allreduce_s_ici_ring": round(t_ici, 6),
            "allreduce_s_2host_dcn": round(t_dcn, 6),
            "weak_scaling_eff_bound_ici_2_4_8_chips": round(eff_ici, 4),
            "weak_scaling_eff_bound_2_hosts": round(eff_dcn, 4),
        }
    return out


def build_workload(num_pulses: int):
    """TLS scan over a structured city scene (BASELINE config-1 shape)."""
    rng = np.random.default_rng(11)
    scene = synthetic.city_scene(rng, num_buildings=64)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 12.0, 0.0),
        rays_per_pulse=RAYS_PER_PULSE, max_returns=1,
        chunk_pulses=num_pulses, include_shiny_surface_error=False,
        shading_mode=ShadingMode.MEASURED)
    az = np.linspace(0.0, 2 * np.pi, num_pulses, endpoint=False)
    el = np.linspace(-0.9, -0.3, num_pulses)
    d = np.stack([np.cos(el) * np.cos(az), np.sin(el),
                  np.cos(el) * np.sin(az)], -1).astype(np.float32)
    offs = (np.arange(RAYS_PER_PULSE, dtype=np.float32)[None, :, None]
            * np.array([0.001, 0.0, 0.001], np.float32))
    o = np.asarray(cfg.tls_position, np.float32) + np.zeros((num_pulses, 1, 3),
                                                            np.float32) + offs
    rays = RayBundle(
        origin=o.astype(np.float32),
        direction=np.broadcast_to(d[:, None, :],
                                  (num_pulses, RAYS_PER_PULSE, 3)).copy(),
        gps_time=np.zeros(num_pulses, np.float32))
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    return scene, bvh, cfg, rays, materials, scalars, noise


def measure(n_dev: int, devices) -> dict:
    num_pulses = PULSES_PER_DEVICE * n_dev
    scene, bvh, cfg, rays, materials, scalars, noise = \
        build_workload(num_pulses)
    mesh = shard_mod.ray_mesh(devices[:n_dev])
    rays = shard_mod.shard_rays(rays, mesh)
    scene, bvh, materials, scalars, noise = shard_mod.replicate(
        (scene, bvh, materials, scalars, noise), mesh)

    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars)
    target = jnp.where(cloud.mask, cloud.intensity * 1.2, 0.0)
    # full north-star gradients: the psum'd bytes then match `analysis`
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False,
                                        grad_params="full")

    loss, *_ = step(scene, bvh, materials, rays, noise, scalars, target)
    loss.block_until_ready()                      # compile + warm up
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        loss, *_ = step(scene, bvh, materials, rays, noise, scalars, target)
        loss.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    total_rays = num_pulses * RAYS_PER_PULSE
    return {"devices": n_dev, "pulses": num_pulses,
            "rays": total_rays, "step_s": dt,
            "rays_per_s": total_rays / dt,
            "loss": float(jax.device_get(loss))}


def virtual_check() -> dict:
    devices = jax.devices()
    sizes_env = os.environ.get("SCALING_DEVICES")
    if sizes_env:
        sizes = [int(s) for s in sizes_env.split(",")]
    else:
        sizes = [n for n in (1, 8) if n <= len(devices)]
    rows = []
    for n in sizes:
        row = measure(n, devices)
        rows.append(row)
        print(json.dumps(row))
    cores = os.cpu_count() or 1
    base = rows[0]["rays_per_s"] / rows[0]["devices"]
    for row in rows:
        row["throughput_vs_1dev_per_dev"] = \
            row["rays_per_s"] / (row["devices"] * base)
    return {
        "kind": ("hardware" if BACKEND != "cpu-virtual"
                 else "virtual-correctness-check"),
        "note": (None if BACKEND != "cpu-virtual" else
                 f"8 virtual devices share {cores} physical cores - this "
                 "validates the SPMD program (collectives, sharded "
                 "buckets, loss parity), NOT hardware scaling; see "
                 "'analysis' and scripts/pod_scaling.md for the scaling "
                 "claim"),
        "device_kind": devices[0].device_kind,
        "backend": BACKEND,
        "physical_cores": cores,
        "pulses_per_device": PULSES_PER_DEVICE,
        "rays_per_pulse": RAYS_PER_PULSE,
        "rows": rows,
    }


def main() -> None:
    out = {}
    if MODE in ("both", "analysis"):
        out["analysis"] = analysis()
    if MODE in ("both", "virtual"):
        out["virtual_check"] = virtual_check()
    eff = None
    if "analysis" in out and out["analysis"]["configs"]:
        eff = min(c["weak_scaling_eff_bound_2_hosts"]
                  for c in out["analysis"]["configs"].values())
    summary = {
        "metric": "weak_scaling_efficiency_bound",
        "value": eff,
        "unit": "fraction, 1->2 hosts, no-overlap bound (analysis)",
        "runbook": "scripts/pod_scaling.md",
    }
    print(json.dumps(summary))
    out = {**summary, **out}
    # keep the pod projection block (scripts/pod_projection.py) if present
    path = os.path.join(REPO, "SCALING.json")
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        if "projected_v5e8" in prev:
            out["projected_v5e8"] = prev["projected_v5e8"]
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
