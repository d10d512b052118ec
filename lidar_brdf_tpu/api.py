"""High-level user API.

The reference's only "API" is its ImGui GUI mutating `LiDARParameters` and a
"Start simulation" button (`GUI.cpp:587-604`).  Here the same capability is
a pure function: scene + config -> point cloud, plus builder helpers.
"""

from __future__ import annotations

import os

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


def attach_face_neighbors(scene: TriangleScene) -> TriangleScene:
    """Scene with the precomputed contiguity table (geom/adjacency.py).

    Speeds the footprint merge up on TPU (~7.6 ms/step at 1.3M rays);
    returns the scene unchanged when the table would exceed the width cap
    (hub-vertex meshes) or is already attached.  Semantics are identical
    either way (`reduceCollisions-comp.glsl:54-62`)."""
    import dataclasses
    if scene.face_neighbors is not None:
        return scene
    from .geom.adjacency import build_face_neighbors
    table = build_face_neighbors(np.asarray(scene.faces),
                                 np.asarray(scene.face_comp))
    if table is None:
        return scene
    return dataclasses.replace(scene, face_neighbors=table)


def build_rays(cfg: SensorConfig, scene: TriangleScene,
               seed: int | None = None) -> RayBundle:
    """Generate the full scan's rays for the configured sensor type
    (dispatch over `LiDARParameters::RayBuild`)."""
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed + 1)
    raygen_noise = noise_mod.make_raygen_noise(key)
    if cfg.lidar_type == LiDARType.TERRESTRIAL_SPHERICAL:
        count = None
        if cfg.use_simulation_time:
            # time-based ray budget (`TerrestrialSphericalBuilder::
            # getNumSimulatedRays`): scan_frequency * simulation_time
            # revolutions of the scan grid (can exceed one revolution —
            # pulse indices continue past the grid).
            from .sensors.tls import num_tls_pulses
            count = int(num_tls_pulses(cfg) * cfg.scan_frequency_hz
                        * cfg.simulation_time)
        return build_tls_rays(cfg, raygen_noise, count=count)
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


def simulate_spectral(scene: TriangleScene, cfg: SensorConfig,
                      library: MaterialLibrary | None = None,
                      bvh: BVH | None = None) -> dict[int, PointCloud]:
    """Wavelength sweep: one simulation per nm in ``cfg.wavelength_nm``
    (reference per-wavelength loop, `LiDARSimulation.cpp:303`).

    Like the reference — which re-binds only the per-wavelength material
    SSBO (`prepareMaterialData`, cpp:428-437) — the sweep compiles ONCE and
    re-binds the MaterialTable per lambda (tables are traced arguments).
    Only a change of the *bathymetric* flag (green aerial wavelengths,
    <533nm) starts a second program, since it changes the physics.
    """
    library = library or MaterialLibrary.default()
    bvh = bvh if bvh is not None else build_scene_bvh(scene)
    rays = build_rays(cfg, scene)
    out: dict[int, PointCloud] = {}
    sims: dict[bool, Simulator] = {}
    lo, hi = cfg.wavelength_nm
    for wl in range(int(lo), int(hi) + 1):
        materials = library.table_at(wl)
        bathy = bool(wl < 533
                     and cfg.lidar_type != LiDARType.TERRESTRIAL_SPHERICAL)
        if bathy not in sims:
            sims[bathy] = Simulator(scene=scene, bvh=bvh,
                                    materials=materials,
                                    cfg=cfg.with_(bathymetric=bathy))
        out[wl] = sims[bathy].run(rays, materials=materials)
    return out


def tls_path_from_canvas(points_2d, canvas_size, scene: TriangleScene,
                         height: float,
                         douglas_peucker_epsilon: float = 3.0) -> np.ndarray:
    """User-drawn 2-D canvas path -> world-space TLS scan positions.

    Reference `LiDARSimulation::getTLSPath` (LiDARSimulation.cpp:161-187):
    redundant-point removal + Douglas-Peucker, then canvas -> scene XZ
    mapping with constant height.
    """
    from .sensors.paths import douglas_peucker, remove_redundant_points
    lo, hi = scene.aabb()
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    pts = remove_redundant_points(np.asarray(points_2d, np.float32))
    pts = douglas_peucker(pts, douglas_peucker_epsilon)
    scene_size = np.array([hi[0] - lo[0], hi[2] - lo[2]])
    scene_min = np.array([lo[0], lo[2]])
    world = pts * scene_size / np.asarray(canvas_size, np.float64) + scene_min
    return np.stack([world[:, 0], np.full(len(world), height),
                     world[:, 1]], axis=1).astype(np.float32)


def loss_curve(cfg: SensorConfig, num_samples: int = 256) -> tuple:
    """Per-return loss probability as a function of shininess (the GUI's
    ImPlot preview, `GUI.cpp:33-71,736-760`): threshold below
    ``loss_threshold``, else mult*(s+add)^power clamped to [0,1]."""
    s = np.linspace(0.0, 1.0, num_samples)
    loss = np.where(
        s < cfg.loss_threshold, 0.0,
        cfg.loss_mult_coefficient
        * np.power(np.maximum(s + cfg.loss_add_coefficient, 0.0),
                   cfg.loss_power))
    return s, np.clip(loss, 0.0, 1.0)


def simulate_tls_path(scene: TriangleScene, cfg: SensorConfig,
                      positions: np.ndarray,
                      materials: MaterialTable | None = None,
                      bvh: BVH | None = None,
                      out_dir: str | None = None) -> list[PointCloud]:
    """TLS multi-position simulation along a path of scan positions.

    Reference `LiDARSimulation::launchMultipleSimulations`
    (LiDARSimulation.cpp:211-286): per waypoint, scan with position =
    waypoint and direction toward the next waypoint; one cloud per position.
    With ``out_dir``, each cloud is written to ``<out_dir>/<i>.ply`` on a
    background writer thread while the next waypoint simulates — the
    reference's detached-thread save (`Results/Paths/TLS/<i>.ply`,
    LiDARPointCloud.cpp:56-61).
    """
    positions = np.asarray(positions, np.float32)
    if materials is None:
        materials = MaterialLibrary.default().table_at(cfg.wavelength_nm[0])
    bvh = bvh if bvh is not None else build_scene_bvh(scene)
    writer = None
    if out_dir is not None:
        from .io.ply import AsyncPlyWriter
        os.makedirs(out_dir, exist_ok=True)
        writer = AsyncPlyWriter()
    clouds = []
    try:
        for i, pos in enumerate(positions):
            if i + 1 < len(positions):
                direction = positions[i + 1] - pos
            else:
                direction = np.zeros(3, np.float32)
            pos_cfg = cfg.with_(
                tls_position=tuple(float(x) for x in pos),
                tls_direction=tuple(float(x) for x in direction))
            rays = build_rays(pos_cfg, scene)
            sim = Simulator(scene=scene, bvh=bvh, materials=materials,
                            cfg=pos_cfg)
            cloud = sim.run(rays)
            clouds.append(cloud)
            if writer is not None:
                writer.submit(os.path.join(out_dir, f"{i}.ply"), cloud)
    finally:
        if writer is not None:
            writer.close()
    return clouds
