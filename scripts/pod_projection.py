"""Write the audited v5e-8 pod-scale projection into SCALING.json.

BASELINE.json phrases the north star at pod scale (>100M rays/s fwd+bwd on
a v5e-8); this rig has ONE chip, so the pod number is necessarily a
projection.  This script makes that projection a single auditable artifact
(VERDICT r04 item 7): for every benched config it combines

    projected = per_chip_measured  x  8 chips  x  ici_allreduce_bound

where per_chip_measured comes from BENCH_r*.json / BENCH_EXTRA.json
(driver-captured single-chip numbers) and the ICI bound is the measured-
step-time + exact-psum-byte-count collective model already recorded in
SCALING.json (ring all-reduce on one 45 GB/s ICI link, one way —
conservative).  Assumptions are stamped inline in the output block.

Usage:  python scripts/pod_projection.py        (rewrites SCALING.json)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench_line():
    """The newest driver-captured BENCH_r*.json line (the tls config)."""
    best = None
    for name in sorted(os.listdir(REPO)):
        if name.startswith("BENCH_r") and name.endswith(".json"):
            with open(os.path.join(REPO, name)) as fh:
                rec = json.load(fh)
            parsed = rec.get("parsed") or {}
            if parsed.get("value"):
                best = (name, parsed)
    return best


def main():
    scaling_path = os.path.join(REPO, "SCALING.json")
    with open(scaling_path) as fh:
        scaling = json.load(fh)
    with open(os.path.join(REPO, "BENCH_EXTRA.json")) as fh:
        extra = json.load(fh)

    bounds = {
        name: cfg["weak_scaling_eff_bound_ici_2_4_8_chips"]
        for name, cfg in scaling["analysis"]["configs"].items()
    }
    # configs without their own collective model use the tls bound (same
    # psum payload class: BRDF table + small-scene vertex grads); the als
    # bound covers the 5M-face vertex-gradient payload
    default_bound = bounds.get("tls", 0.9966)

    sources = {}
    bench = latest_bench_line()
    if bench is not None:
        name, parsed = bench
        sources["tls"] = (parsed["value"], name)
    for key in ("multireturn", "als", "alphaprime"):
        entry = extra.get(key)
        if entry and entry.get("value"):
            sources[key] = (entry["value"], f"BENCH_EXTRA.json::{key}")

    configs = {}
    for key, (per_chip, source) in sources.items():
        bound = bounds.get(key, default_bound)
        projected = per_chip * 8 * bound
        configs[key] = {
            "per_chip_measured_rays_s": round(per_chip, 1),
            "measured_source": source,
            "ici_allreduce_bound_8_chips": bound,
            "projected_rays_s": round(projected, 1),
            "meets_100M_target": projected >= 100e6,
        }

    scaling["projected_v5e8"] = {
        "label": ("PROJECTED - per-chip measured on 1 real v5e chip, "
                  "8-chip collective cost modeled (not measured; no "
                  "multi-chip hardware on this rig)"),
        "formula": "per_chip_measured x 8 x ici_allreduce_bound",
        "assumptions": [
            "linear ray-parallel scaling: rays shard over chips with the "
            "scene/BVH/table replicated, so per-chip work is unchanged "
            "(verified to compile+execute on an 8-device CPU mesh, "
            "tests/test_shard.py + MULTICHIP dryrun)",
            "collective cost: ring all-reduce of the full psum payload "
            "(BRDF table + vertex grads, exact byte counts in "
            "analysis.configs) on ONE 45 GB/s ICI link one way - "
            "conservative vs the 2D torus",
            "no host involvement per step (the bench step is "
            "device-resident; host cull amortized across steps)",
        ],
        "configs": configs,
    }
    with open(scaling_path, "w") as fh:
        json.dump(scaling, fh, indent=1)
    for key, cfg in configs.items():
        print(f"{key:12s} {cfg['per_chip_measured_rays_s']/1e6:7.1f}M/chip "
              f"x8 x{cfg['ici_allreduce_bound_8_chips']:.4f} = "
              f"{cfg['projected_rays_s']/1e6:7.1f}M projected "
              f"({'>=' if cfg['meets_100M_target'] else '<'} 100M)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
