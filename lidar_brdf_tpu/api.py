"""High-level user API.

The reference's only "API" is its ImGui GUI mutating `LiDARParameters` and a
"Start simulation" button (`GUI.cpp:587-604`).  Here the same capability is
a pure function: scene + config -> point cloud, plus builder helpers.
"""

from __future__ import annotations

import numpy as np
import jax

from .core.config import LiDARType, SensorConfig
from .core.types import BVH, MaterialTable, PointCloud, RayBundle, TriangleScene
from .geom.bvh import build_bvh
from .io.materials import MaterialLibrary
from .runtime.simulate import Simulator
from .sensors.als import build_als_rays, plan_flight
from .sensors.tls import build_tls_rays, num_tls_pulses
from .utils import noise as noise_mod


def build_scene_bvh(scene: TriangleScene) -> BVH:
    return build_bvh(np.asarray(scene.vertices), np.asarray(scene.faces))


def build_rays(cfg: SensorConfig, scene: TriangleScene,
               seed: int | None = None) -> RayBundle:
    """Generate the full scan's rays for the configured sensor type
    (dispatch over `LiDARParameters::RayBuild`)."""
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed + 1)
    raygen_noise = noise_mod.make_raygen_noise(key)
    if cfg.lidar_type == LiDARType.TERRESTRIAL_SPHERICAL:
        return build_tls_rays(cfg, raygen_noise)
    lo, hi = scene.aabb()
    plan = plan_flight(cfg, np.asarray(lo), np.asarray(hi),
                       np.random.default_rng(seed))
    return build_als_rays(cfg, plan, raygen_noise)


def simulate(scene: TriangleScene, cfg: SensorConfig,
             materials: MaterialTable | None = None,
             bvh: BVH | None = None,
             rays: RayBundle | None = None) -> PointCloud:
    """One-call simulation: rays -> BVH traversal -> returns -> intensity.

    Runs the configured wavelength (single lambda; for sweeps call once per
    wavelength with `MaterialLibrary.table_at`, mirroring the reference's
    per-wavelength loop `LiDARSimulation.cpp:303`).
    """
    if materials is None:
        materials = MaterialLibrary.default().table_at(cfg.wavelength_nm[0])
    if bvh is None:
        bvh = build_scene_bvh(scene)
    if rays is None:
        rays = build_rays(cfg, scene)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg)
    return sim.run(rays)
