"""Runtime subsystem tests: chunking, checkpoint/resume, metrics."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_brdf_tpu.api import build_rays, build_scene_bvh
from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.runtime.checkpoint import (ChunkCheckpointer, load_params,
                                               save_params)
from lidar_brdf_tpu.runtime.metrics import PipelineMetrics
from lidar_brdf_tpu.runtime.simulate import Simulator


def _mk(rng, chunk_pulses):
    scene = synthetic.terrain_with_boxes(rng, num_boxes=3)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        tls_position=(0.0, 9.0, 0.0), tls_fov_vertical=70.0,
        tls_middle_angle_vertical=-40.0, tls_fov_horizontal=360.0,
        tls_resolution_horizontal=24, tls_resolution_vertical=8,
        rays_per_pulse=2, max_returns=1, chunk_pulses=chunk_pulses,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    return scene, bvh, cfg, rays, materials


def test_chunked_equals_single_pass(rng):
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=64)
    sim_chunked = Simulator(scene=scene, bvh=bvh, materials=materials,
                            cfg=cfg)
    cloud_a = sim_chunked.run(rays)
    cfg_big = cfg.with_(chunk_pulses=24 * 8)
    sim_single = Simulator(scene=scene, bvh=bvh, materials=materials,
                           cfg=cfg_big)
    cloud_b = sim_single.run(rays)
    ma, mb = np.asarray(cloud_a.mask), np.asarray(cloud_b.mask)
    assert ma.sum() == mb.sum()
    pa = np.asarray(cloud_a.position)[ma]
    pb = np.asarray(cloud_b.position)[mb]
    # same points in some order: compare sorted
    np.testing.assert_allclose(np.sort(pa.round(4), axis=0),
                               np.sort(pb.round(4), axis=0), atol=1e-3)


def test_checkpoint_resume(rng, tmp_path):
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=48)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg)
    ckdir = str(tmp_path / "ck")
    cloud_full = sim.run(rays, checkpoint_dir=ckdir)
    ck = ChunkCheckpointer(ckdir)
    assert ck.completed_chunks() == -(-rays.num_pulses // 48)
    # simulate a crash after 1 chunk: truncate state, resume
    import json
    with open(ck.state_path, "w") as fh:
        json.dump({"completed_chunks": 1}, fh)
    cloud_resumed = sim.run(rays, checkpoint_dir=ckdir)
    assert int(np.asarray(cloud_resumed.mask).sum()) == \
        int(np.asarray(cloud_full.mask).sum())


def test_params_roundtrip(tmp_path):
    materials = MaterialLibrary.default().table_at(1064)
    path = str(tmp_path / "params.npz")
    save_params(path, materials, step=42)
    back, step, _ = load_params(path)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(materials.brdf_table),
                                  np.asarray(back.brdf_table))


def test_metrics_aggregation():
    m = PipelineMetrics()
    import time
    for _ in range(3):
        with m.stage("TRAVERSE"):
            time.sleep(0.01)
    assert m.mean("TRAVERSE") >= 0.01
    assert "TRAVERSE" in m.report()
    m2 = PipelineMetrics(discard_first=True)
    m2.samples["X"] = [100.0, 1.0, 1.0]
    assert abs(m2.mean("X") - 1.0) < 1e-9


def test_simulator_wide_beam_fallback(rng):
    """Incoherent ray directions make useless beams; the Simulator must
    detect that and fall back to packet traversal (same results path)."""
    from conftest import make_random_scene
    from lidar_brdf_tpu.core.types import RayBundle
    import jax.numpy as jnp
    scene = make_random_scene(rng, num_tris=80)
    from lidar_brdf_tpu.api import build_scene_bvh
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.core.config import SensorConfig, ShadingMode
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(rays_per_pulse=1, max_returns=1, chunk_pulses=256,
                       max_range=500.0, shading_mode=ShadingMode.MEASURED)
    mats = MaterialLibrary.default().table_at(1064)
    P = 256
    o = rng.uniform(-10, 10, (P, 1, 3)).astype(np.float32)
    d = rng.normal(size=(P, 1, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(origin=jnp.asarray(o), direction=jnp.asarray(d),
                     gps_time=jnp.zeros(P, jnp.float32))
    sim = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                    reorder=False)
    assert sim._culled_active
    assert not sim._culler.beams_ok(o, d)      # fallback branch taken
    cloud = sim.run(rays)
    ref = Simulator(scene=scene, bvh=bvh, materials=mats, cfg=cfg,
                    use_culled=False).run(rays)
    assert (np.asarray(cloud.mask) == np.asarray(ref.mask)).any()
    np.testing.assert_allclose(
        np.sort(np.asarray(cloud.intensity)[np.asarray(cloud.mask)]),
        np.sort(np.asarray(ref.intensity)[np.asarray(ref.mask)]),
        rtol=1e-5, atol=1e-8)


def test_benchmark_numexecs_per_stage(rng):
    """`Simulator.benchmark`: the reference's numExecs repetition mode with
    first-run discard and per-stage mean±std (`LiDARSimulation.cpp:292-365`,
    `PipelineMetrics.h:19-30`).  At least 4 real pipeline stages must carry
    num_execs samples each."""
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=192)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg)
    metrics = sim.benchmark(rays, num_execs=3, discard_first=True)
    report = metrics.report()
    real = [s for s in ("RAY_BUILDING", "FIND_COLLISION", "REDUCE",
                        "INTENSITY", "TOTAL", "READ")
            if len(metrics.samples.get(s, [])) == 3]
    assert len(real) >= 4, report
    for s in real:
        assert metrics.mean(s) > 0.0
        # discard_first keeps num_execs - 1 samples
        assert len(metrics._kept(s)) == 2
    assert metrics.mean("TOTAL") >= metrics.mean("INTENSITY")
    assert "TOTAL" in report and "FIND_COLLISION" in report


def test_ladder_cache_repeat_run_identical(rng):
    """Second run of the same rays hits the device-resident ladder cache
    and produces the identical point cloud (VERDICT r03 item 4c)."""
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=64)
    # narrow FOV so the chunk beams pass the narrowness gate and the culled
    # path (the one that caches) actually runs
    cfg = cfg.with_(tls_fov_horizontal=40.0, tls_fov_vertical=30.0)
    rays = build_rays(cfg, scene)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg)
    cloud_a = sim.run(rays)
    if getattr(sim, "_culled_active", False):
        assert len(getattr(sim, "_ladder_cache", {})) > 0
        # second run: every chunk served from cache (prepare not re-run)
        calls = []
        orig_prepare = sim._culler.prepare

        def spy(*a, **kw):
            calls.append(1)
            return orig_prepare(*a, **kw)

        sim._culler.prepare = spy
        cloud_b = sim.run(rays)
        assert not calls, "cache miss on identical repeat run"
    else:
        cloud_b = sim.run(rays)
    for name in type(cloud_a).__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(cloud_a, name)),
            np.asarray(getattr(cloud_b, name)), err_msg=name)


def test_ladder_cache_eviction(rng):
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=32)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg,
                    cache_ladders_max=2)
    sim.run(rays)   # 24*8=192 pulses -> 6 chunks, cache capped at 2
    if getattr(sim, "_culled_active", False):
        assert len(sim._ladder_cache) <= 2


def test_benchmark_steady_state_report(rng):
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=48)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg)
    metrics = sim.benchmark(rays, num_execs=3, steady_chunks=2)
    rep = metrics.report()
    assert "RUN_FIRST" in rep and "RUN_STEADY" in rep
    assert "points/s" in rep
    # first pass sampled separately from steady passes (compile isolation)
    assert len(metrics.samples["RUN_FIRST"]) == 1
    assert len(metrics.samples["RUN_STEADY"]) == 2


def test_compact_readback_equals_dense(rng):
    """Device-side compaction (`pack_compact` in-jit + prefix fetch) yields
    the same point multiset as the dense-slot path, with mask all-True."""
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=64)
    dense = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg,
                      compact_readback=False).run(rays)
    compact = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg,
                        compact_readback=True).run(rays)
    assert bool(np.asarray(compact.mask).all())
    n = int(np.asarray(dense.mask).sum())
    assert compact.capacity == n > 0

    def rows(cloud):
        m = np.asarray(cloud.mask)
        r = np.concatenate(
            [np.asarray(cloud.position)[m],
             np.asarray(cloud.intensity)[m][:, None],
             np.asarray(cloud.distance)[m][:, None],
             np.asarray(cloud.return_number)[m][:, None].astype(np.float32),
             np.asarray(cloud.num_returns)[m][:, None].astype(np.float32),
             np.asarray(cloud.comp_id)[m][:, None].astype(np.float32),
             np.asarray(cloud.semantic)[m][:, None].astype(np.float32),
             np.asarray(cloud.asprs)[m][:, None].astype(np.float32),
             np.asarray(cloud.gps_time)[m][:, None],
             np.asarray(cloud.normal)[m],
             np.asarray(cloud.uv)[m]], axis=1)
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_allclose(rows(compact), rows(dense), rtol=0, atol=0)


def test_compact_readback_hint_prefetch_repeat_run(rng):
    """Second run takes the count-hint prefetch branch (pre is not None)
    and must reproduce the first run's cloud exactly."""
    scene, bvh, cfg, rays, materials = _mk(rng, chunk_pulses=64)
    sim = Simulator(scene=scene, bvh=bvh, materials=materials, cfg=cfg,
                    compact_readback=True)
    first = sim.run(rays)
    assert sim._count_hints           # hints populated by the first pass
    second = sim.run(rays)
    assert second.capacity == first.capacity
    for f in ("position", "intensity", "distance", "gps_time"):
        np.testing.assert_array_equal(np.asarray(getattr(first, f)),
                                      np.asarray(getattr(second, f)))
