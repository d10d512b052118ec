"""Example: scene-geometry refinement — recover per-building placement.

Third leg of the BASELINE.json differentiable-simulation story (with
`fit_brdf.py` and `fit_pose.py`): every building in the scene is placed
with a small rigid offset error (a misregistered reconstruction);
gradient descent through the simulator recovers each component's offset
from the captured ranges.  Gradients reach the vertices through the
differentiable hit re-evaluation (fixed hit topology) and chain into the
per-component offsets by construction.

Free-form per-VERTEX fitting from a single scan is underdetermined
(range residuals along fixed rays cannot see in-facet slides — measured:
it diverges); a parametric deformation like the rigid per-component
offsets here is the well-posed formulation, and the same machinery
supports any differentiable parameterization.

Run: python examples/fit_geometry.py  [--steps N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(steps: int = 150, backend: str | None = None) -> float:
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

    rng = np.random.default_rng(7)
    scene = synthetic.city_scene(rng, num_buildings=16)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        tls_position=(0.0, 10.0, 0.0), tls_fov_horizontal=360.0,
        tls_fov_vertical=90.0, tls_middle_angle_vertical=-40.0,
        tls_resolution_horizontal=96, tls_resolution_vertical=48,
        rays_per_pulse=2, max_returns=1, chunk_pulses=96 * 48,
        shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=False)
    rays = build_rays(cfg, scene)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    scalars = SimScalars.from_config(cfg, 0.0)
    materials = MaterialLibrary.default().table_at(1064)

    # vertex -> component map (host, once): a vertex belongs to the
    # component of any face using it
    faces_np = np.asarray(scene.faces)
    fcomp_np = np.asarray(scene.face_comp)
    vcomp = np.zeros(int(scene.num_vertices), np.int32)
    vcomp[faces_np.reshape(-1)] = np.repeat(fcomp_np, 3)
    C = int(fcomp_np.max()) + 1

    scene, bvh, materials, rays = jax.tree.map(
        jnp.asarray, (scene, bvh, materials, rays))
    true_verts = scene.vertices
    vcomp_d = jnp.asarray(vcomp)

    def forward(offsets):
        verts = true_verts + offsets[vcomp_d]
        sc = scene.__class__(**{**scene.__dict__, "vertices": verts})
        cloud = simulate_chunk(sc, bvh, materials, rays, noise,
                               scalars, cfg, scene_has_water=False)
        return jnp.where(cloud.mask, cloud.distance, 0.0), cloud.mask

    target, target_mask = forward(jnp.zeros((C, 3), jnp.float32))

    def loss_fn(offsets):
        pred, mask = forward(offsets)
        both = mask & target_mask
        return jnp.sum(jnp.where(both, (pred - target) ** 2, 0.0)) \
            / jnp.maximum(jnp.sum(both), 1)

    # misregistration: every component displaced by ~2 cm (ground included;
    # must stay well below triangle scale so the fixed hit topology holds)
    offsets0 = jnp.asarray(
        rng.normal(0.0, 0.02, size=(C, 3)).astype(np.float32))
    opt = optax.adam(5e-3)
    state = opt.init(offsets0)

    @jax.jit
    def step(offsets, state):
        loss, g = jax.value_and_grad(loss_fn)(offsets)
        updates, state = opt.update(g, state)
        return optax.apply_updates(offsets, updates), state, loss

    offsets = offsets0
    err0 = float(jnp.linalg.norm(offsets0, axis=1).mean())
    print(f"components: {C}")
    for i in range(steps):
        offsets, state, loss = step(offsets, state)
        if i % 25 == 0 or i == steps - 1:
            err = float(jnp.linalg.norm(offsets, axis=1).mean())
            print(f"step {i:4d}  loss {float(loss):.3e}  "
                  f"mean offset {err * 100:.2f} cm")
    err = float(jnp.linalg.norm(offsets, axis=1).mean())
    print(f"mean placement error {err0 * 100:.2f} cm -> {err * 100:.2f} cm "
          f"({err0 / max(err, 1e-9):.1f}x); the residual is the single-scan "
          f"observability null space (offset components along occluded or "
          f"edge-on faces produce no range change - the loss itself "
          f"converges to ~0)")
    return err / max(err0, 1e-12)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    sys.exit(0 if main(args.steps, args.backend) < 0.5 else 1)
