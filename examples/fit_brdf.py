"""Example: inverse rendering — fit BRDF tables to observed intensities.

The differentiable-simulation use case from BASELINE.json: given a point
cloud captured with unknown material reflectance, recover the measured-BRDF
tables by gradient descent through the full simulator (traversal is opaque;
gradients flow through the Hermite table lookup and the radar equation).

Run: python examples/fit_brdf.py  [--steps N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(steps: int = 60, backend: str | None = None) -> float:
    import jax
    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp
    import optax

    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk
    from lidar_brdf_tpu.utils import noise as noise_mod

    rng = np.random.default_rng(0)
    scene = synthetic.city_scene(rng, num_buildings=16)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        tls_position=(0.0, 10.0, 0.0), tls_fov_horizontal=360.0,
        tls_fov_vertical=90.0, tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=64, tls_resolution_vertical=32,
        rays_per_pulse=2, max_returns=1, chunk_pulses=64 * 32,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=False)
    rays = build_rays(cfg, scene)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    scalars = SimScalars.from_config(cfg, 0.0)
    true_materials = MaterialLibrary.default().table_at(1064)
    # device-resident copies (these are closed over inside jit)
    scene, bvh, true_materials = jax.tree.map(
        jnp.asarray, (scene, bvh, true_materials))

    def forward(table):
        mats = true_materials.__class__(
            **{**true_materials.__dict__, "brdf_table": table})
        cloud = simulate_chunk(scene, bvh, mats, rays, noise, scalars, cfg,
                               scene_has_water=False)
        return jnp.where(cloud.mask, cloud.intensity, 0.0)

    target = forward(jnp.asarray(true_materials.brdf_table))

    def loss_fn(table):
        pred = forward(table)
        return jnp.mean((pred - target) ** 2) * 1e6

    # start from a flat wrong guess
    table0 = jnp.full_like(jnp.asarray(true_materials.brdf_table), 0.5)
    opt = optax.adam(3e-2)
    state = opt.init(table0)

    @jax.jit
    def step(table, state):
        loss, g = jax.value_and_grad(loss_fn)(table)
        updates, state = opt.update(g, state)
        return optax.apply_updates(table, updates), state, loss

    table = table0
    loss0 = None
    for i in range(steps):
        table, state, loss = step(table, state)
        if loss0 is None:
            loss0 = float(loss)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}")
    final = float(loss)
    print(f"loss reduced {loss0:.4f} -> {final:.4f} "
          f"({loss0 / max(final, 1e-12):.1f}x)")
    return final / max(loss0, 1e-12)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    main(args.steps, args.backend)
