"""High-level API tests: spectral sweep, TLS paths, canvas mapping, config."""

import numpy as np

from lidar_brdf_tpu.api import (loss_curve, simulate_tls_path,
                                tls_path_from_canvas)
from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode, get_preset
from lidar_brdf_tpu.io import synthetic


def test_config_json_roundtrip():
    cfg = get_preset("pandar64").with_(max_range=123.0)
    text = cfg.to_json()
    back = SensorConfig.from_json(text)
    assert back == cfg


def test_loss_curve_shape():
    cfg = SensorConfig()
    s, loss = loss_curve(cfg)
    assert loss.min() >= 0 and loss.max() <= 1
    assert (loss[s < cfg.loss_threshold] == 0).all()
    assert loss[-1] > 0


def test_tls_canvas_path(rng):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=2, half=20.0)
    pts = np.array([[0, 0], [50, 0], [100, 100.0]])
    path = tls_path_from_canvas(pts, (100.0, 100.0), scene, height=1.5)
    lo, hi = scene.aabb()
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert (path[:, 1] == 1.5).all()
    assert (path[:, 0] >= lo[0] - 1e-3).all()
    assert (path[:, 0] <= hi[0] + 1e-3).all()
    np.testing.assert_allclose(path[0, [0, 2]], [lo[0], lo[2]], atol=1e-4)


def test_spectral_sweep_single_compile(rng, monkeypatch):
    """A 5-lambda sweep compiles ONCE: the MaterialTable is a traced
    argument re-bound per wavelength, like the reference re-binds only the
    material SSBO (`LiDARSimulation.cpp:303,428-437`)."""
    from lidar_brdf_tpu.api import simulate_spectral
    from lidar_brdf_tpu.runtime.simulate import Simulator

    created = []
    orig = Simulator.__post_init__

    def spy(self):
        orig(self)
        created.append(self)
    monkeypatch.setattr(Simulator, "__post_init__", spy)

    scene = synthetic.terrain_with_boxes(rng, num_boxes=2, half=20.0)
    cfg = SensorConfig(
        tls_position=(0.0, 6.0, 0.0),
        tls_resolution_horizontal=24, tls_resolution_vertical=8,
        tls_fov_vertical=60.0, tls_middle_angle_vertical=-45.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=192,
        wavelength_nm=(1060, 1064), shading_mode=ShadingMode.MEASURED,
        include_shiny_surface_error=False)
    out = simulate_spectral(scene, cfg)
    assert len(out) == 5
    assert len(created) == 1, "sweep must reuse one Simulator"
    sim = created[0]
    compiles = sum(f._cache_size() for f in (sim._jitted,
                                             getattr(sim, "_jitted_culled",
                                                     sim._jitted)))
    assert compiles <= 2, f"{compiles} compiled entries across the sweep"
    m = np.asarray(out[1060].mask)
    np.testing.assert_array_equal(m, np.asarray(out[1064].mask))
    np.testing.assert_array_equal(np.asarray(out[1060].position),
                                  np.asarray(out[1064].position))
    # the re-bind is live: a scaled table scales intensities, still with no
    # new compile (MaterialTable is traced, not baked into the program)
    import dataclasses
    from lidar_brdf_tpu.api import build_rays
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    mats = MaterialLibrary.default().table_at(1064)
    scaled = dataclasses.replace(mats, brdf_table=mats.brdf_table * 0.5)
    rays = build_rays(cfg, scene)
    half = sim.run(rays, materials=scaled)
    i4 = np.asarray(out[1064].intensity)
    ih = np.asarray(half.intensity)
    # table lookups clamp to [0,1], so scaling is not exactly linear — but
    # a smaller table can never brighten, and must dim somewhere
    assert (ih[m] <= i4[m] + 1e-9).all()
    assert not np.allclose(ih[m], i4[m])
    compiles_after = sum(f._cache_size() for f in (sim._jitted,
                                                   sim._jitted_culled))
    assert compiles_after == compiles, "re-bind must not recompile"


def test_simulate_tls_path_multi_position(rng):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=2, half=20.0)
    cfg = SensorConfig(
        tls_resolution_horizontal=12, tls_resolution_vertical=6,
        tls_fov_vertical=60.0, tls_middle_angle_vertical=-45.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=72,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    positions = np.array([[0.0, 5.0, 0.0], [5.0, 5.0, 0.0]])
    clouds = simulate_tls_path(scene, cfg, positions)
    assert len(clouds) == 2
    for c in clouds:
        assert int(np.asarray(c.mask).sum()) > 0
    # distinct scan origins produce distinct clouds
    p0 = np.asarray(clouds[0].position)[np.asarray(clouds[0].mask)]
    p1 = np.asarray(clouds[1].position)[np.asarray(clouds[1].mask)]
    assert not np.allclose(p0.mean(axis=0), p1.mean(axis=0), atol=1e-3)
