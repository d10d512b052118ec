"""Real 2-process `jax.distributed` tests for parallel/multihost.py.

The reference is single-GPU (SURVEY.md §2.6); multi-host is a new axis the
TPU framework adds.  These tests run the ACTUAL distributed runtime: two OS
processes, a localhost coordinator, 2 virtual CPU devices per process (4
global), per-host ray generation, a cross-host gradient psum, and per-host
PLY shard writes — then cross-check against a single-process run of the
same workload.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_process_pulse_range_arithmetic(monkeypatch):
    """Contiguous, disjoint, covering ranges for any (total, n, i)."""
    import jax
    from lidar_brdf_tpu.parallel import multihost

    for n in (1, 2, 3, 4, 8):
        for total in (7, 8, 64, 100, 1001):
            covered = []
            for i in range(n):
                monkeypatch.setattr(jax, "process_count", lambda n=n: n)
                monkeypatch.setattr(jax, "process_index", lambda i=i: i)
                lo, hi = multihost.process_pulse_range(total)
                assert 0 <= lo <= hi <= total
                covered.append((lo, hi))
            # disjoint + complete cover
            assert covered[0][0] == 0
            assert covered[-1][1] == total
            for (a, b), (c, d) in zip(covered, covered[1:]):
                assert b == c


def test_two_process_distributed_simulation(tmp_path):
    """End-to-end: 2 processes x 2 devices, per-host rays, cross-host psum,
    per-host PLY shards; totals must match a single-process run."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    r0 = json.load(open(tmp_path / "result0.json"))
    r1 = json.load(open(tmp_path / "result1.json"))

    # pulse ranges partition the scan
    assert r0["lo"] == 0 and r0["hi"] == r1["lo"]

    # the psum'd loss and material gradients are bit-identical on each host
    assert r0["loss"] == r1["loss"] and r0["loss"] > 0.0
    assert r0["grad_sum"] == r1["grad_sum"] and r0["grad_sum"] > 0.0

    # per-host shards exist, are disjoint, and total the single-process run
    assert os.path.exists(r0["shard"]) and os.path.exists(r1["shard"])
    from lidar_brdf_tpu.io.ply import read_ply
    d0, d1 = read_ply(r0["shard"]), read_ply(r1["shard"])
    assert len(d0["x"]) == r0["n_local"]
    assert len(d1["x"]) == r1["n_local"]

    # single-process reference of the same workload
    import jax
    from lidar_brdf_tpu.api import build_rays, build_scene_bvh, simulate
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.runtime.simulate import simulate_chunk
    from lidar_brdf_tpu.utils import noise as noise_mod
    import functools

    v, f = synthetic.ground_plane(half=40.0, y=0.0, cells=3)
    scene = synthetic.scene_from_arrays(v, f)
    bvh = build_scene_bvh(scene)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 10.0, 0.0),
        tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
        tls_middle_angle_vertical=-45.0,
        tls_resolution_horizontal=16, tls_resolution_vertical=8,
        rays_per_pulse=2, max_returns=1, chunk_pulses=128,
        include_shiny_surface_error=False,
        shading_mode=ShadingMode.MEASURED)
    rays = build_rays(cfg, scene)
    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    cloud = jax.jit(functools.partial(simulate_chunk, cfg=cfg,
                                      scene_has_water=False))(
        scene, bvh, materials, rays, noise, scalars)
    n_ref = int(np.asarray(cloud.mask).sum())
    assert r0["n_local"] + r1["n_local"] == n_ref

    # shard contents = the reference run's points (order-free multiset)
    xs = np.sort(np.concatenate([d0["x"], d1["x"]]))
    xs_ref = np.sort(np.asarray(cloud.position)[np.asarray(cloud.mask), 0])
    np.testing.assert_allclose(xs, xs_ref, rtol=1e-6, atol=1e-6)
