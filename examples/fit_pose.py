"""Example: sensor-pose refinement — recover a TLS position offset.

The second leg of the BASELINE.json differentiable-simulation story
(alongside `fit_brdf.py`): a scan is captured from an unknown, slightly
mis-calibrated sensor position; gradient descent through the full
simulator recovers the offset by matching per-pulse ranges.  Gradients
flow through the differentiable hit re-evaluation (fixed hit topology —
the standard differentiable-ray-tracing treatment; the reference cannot
do this at all).

Range residuals (not intensities) drive this fit: corrected distance is
linear in the origin along each ray, so the loss is smooth as long as the
winner faces do not change — which a small calibration offset guarantees.

Run: python examples/fit_pose.py  [--steps N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(steps: int = 80, backend: str | None = None) -> float:
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

    rng = np.random.default_rng(3)
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
    materials = MaterialLibrary.default().table_at(1064)
    scene, bvh, materials, rays = jax.tree.map(
        jnp.asarray, (scene, bvh, materials, rays))

    def forward(origin_offset):
        shifted = rays.__class__(
            origin=rays.origin + origin_offset[None, None, :],
            direction=rays.direction, gps_time=rays.gps_time)
        cloud = simulate_chunk(scene, bvh, materials, shifted, noise,
                               scalars, cfg, scene_has_water=False)
        return jnp.where(cloud.mask, cloud.distance, 0.0), cloud.mask

    target, target_mask = forward(jnp.zeros(3, jnp.float32))

    def loss_fn(offset):
        pred, mask = forward(offset)
        both = mask & target_mask
        return jnp.sum(jnp.where(both, (pred - target) ** 2, 0.0)) \
            / jnp.maximum(jnp.sum(both), 1)

    # the "mis-calibrated" start: 18 cm off in x/y/z
    offset0 = jnp.array([0.12, -0.08, 0.09], jnp.float32)
    opt = optax.adam(1e-2)
    state = opt.init(offset0)

    @jax.jit
    def step(offset, state):
        loss, g = jax.value_and_grad(loss_fn)(offset)
        updates, state = opt.update(g, state)
        return optax.apply_updates(offset, updates), state, loss

    offset = offset0
    err0 = float(jnp.linalg.norm(offset0))
    for i in range(steps):
        offset, state, loss = step(offset, state)
        if i % 10 == 0 or i == steps - 1:
            err = float(jnp.linalg.norm(offset))
            print(f"step {i:4d}  loss {float(loss):.3e}  "
                  f"|offset| {err * 100:.2f} cm")
    err = float(jnp.linalg.norm(offset))
    print(f"pose error {err0 * 100:.1f} cm -> {err * 100:.3f} cm "
          f"({err0 / max(err, 1e-9):.0f}x)")
    return err


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    sys.exit(0 if main(args.steps, args.backend) < 0.02 else 1)
