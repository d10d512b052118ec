"""Generate the measured-parity table in PARITY.md (VERDICT r03 item 5).

Runs the jitted pipeline against the independent scalar transcription of
the reference kernels (tests/test_parity_oracle.py) for the composed
bathymetric pipeline AND real builder geometry (TLS spherical, ALS zigzag,
ALS elliptical), and records the measured deltas — pulses compared, max
|delta position|, max |delta distance|, max relative |delta intensity| —
between the markers in PARITY.md.

    python scripts/parity_report.py          # rewrites PARITY.md section
"""

import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

BEGIN = "<!-- parity-measured:begin -->"
END = "<!-- parity-measured:end -->"


def _measure(name, scene, rays, materials, noise_buf, scalars, cfg):
    import test_parity_oracle as po

    cloud = po._run_pipeline(scene, rays, materials, noise_buf, scalars, cfg)
    rec, out = po.oracle_simulate(scene, rays, materials,
                                  np.asarray(noise_buf), scalars, cfg)
    L, P = cfg.max_returns, rays.num_pulses
    K = L * P
    o_mask = rec["mask"].reshape(K)
    n = int(o_mask.sum())
    pos = np.asarray(cloud.position)[:K][o_mask]
    opos = rec["point"].reshape(K, 3)[o_mask]
    dist = np.asarray(cloud.distance)[:K][o_mask]
    odist = rec["distance"].reshape(K)[o_mask]
    inten = np.asarray(cloud.intensity)[:K][o_mask]
    ointen = rec["intensity"].reshape(K)[o_mask]
    mask_eq = bool((np.asarray(cloud.mask)[:K] == o_mask).all())
    d_pos = float(np.abs(pos - opos).max()) if n else 0.0
    d_dist = float(np.abs(dist - odist).max()) if n else 0.0
    rel_i = float((np.abs(inten - ointen)
                   / np.maximum(np.abs(ointen), 1e-9)).max()) if n else 0.0
    om = out["mask"].reshape(K)
    n_out = int(om.sum())
    return dict(name=name, pulses=P, returns=n, outliers=n_out,
                mask_exact=mask_eq, d_pos_m=d_pos, d_dist_m=d_dist,
                rel_d_intensity=rel_i)


def main():
    import test_parity_oracle as po
    from lidar_brdf_tpu.api import build_rays
    from lidar_brdf_tpu.core.config import (BRDFInterpolation, LiDARType,
                                            SensorConfig, ShadingMode)
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.utils import noise as noise_mod

    scene = po.parity_scene()
    materials = MaterialLibrary.default().table_at(532)
    min_y = float(np.asarray(scene.vertices)[:, 1].min())
    noise_buf = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    rows = []

    # composed pipeline on the synthetic pulse grid (aerial linear)
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_LINEAR,
        rays_per_pulse=3, max_returns=3, max_range=60.0,
        pulse_radius=0.001, bathymetric=True, water_height=0.5,
        include_outliers=True, outlier_threshold=0.2,
        outlier_range=(0.1, 0.8),
        include_shiny_surface_error=True,
        include_terrain_induced_error=True,
        shading_mode=ShadingMode.MEASURED,
        brdf_interpolation=BRDFInterpolation.HERMITE)
    rows.append(_measure(
        "composed (aerial grid, bathymetric)", scene, po.parity_rays(),
        materials, noise_buf, SimScalars.from_config(cfg, min_y), cfg))

    for kind in ("tls_spherical", "als_zigzag", "als_elliptical"):
        cfg = po._builder_cfg(kind)
        with jax.default_device(jax.devices("cpu")[0]):
            rays = build_rays(cfg, scene)
        P = min(96, rays.num_pulses)
        stride = max(rays.num_pulses // P, 1)
        rays = jax.tree.map(
            lambda a: np.ascontiguousarray(
                np.asarray(a)[:P * stride:stride]), rays)
        rows.append(_measure(
            kind, scene, rays, materials, noise_buf,
            SimScalars.from_config(cfg, min_y), cfg))

    lines = [
        BEGIN,
        "## Measured parity (regenerate: `python scripts/parity_report.py`)",
        "",
        "Pipeline (jitted, f32) vs the independent scalar f64 transcription",
        "of the reference kernels (`tests/test_parity_oracle.py`), "
        "bathymetric 532 nm, 3 returns, outliers + shiny/terrain errors on:",
        "",
        "| case | pulses | returns | outliers | masks exact | max \\|dpos\\| "
        "(m) | max \\|ddist\\| (m) | max rel dI |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['pulses']} | {r['returns']} | "
            f"{r['outliers']} | {'yes' if r['mask_exact'] else 'NO'} | "
            f"{r['d_pos_m']:.2e} | {r['d_dist_m']:.2e} | "
            f"{r['rel_d_intensity']:.2e} |")
    lines += [
        "",
        "Deltas are f32-vs-f64 rounding through refraction legs and "
        "acos/terrain-error amplification — semantic drift moves points "
        "by centimeters-to-meters and intensities by orders of magnitude "
        "(see tolerance rationale in the test file).",
        END,
    ]
    block = "\n".join(lines)

    path = os.path.join(ROOT, "PARITY.md")
    with open(path) as fh:
        text = fh.read()
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                      text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)
    print(block)
    return 0


if __name__ == "__main__":
    sys.exit(main())
