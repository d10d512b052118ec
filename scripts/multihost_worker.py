"""Worker process for the real 2-process `jax.distributed` CPU test.

Launched by tests/test_multihost.py as::

    python scripts/multihost_worker.py <proc_id> <num_procs> <port> <outdir>

Each process owns 2 virtual CPU devices (4 global), initializes the
distributed runtime against a localhost coordinator, generates ONLY its own
pulse range (`process_pulse_range` / `host_local_rays`), assembles the
global sharded ray arrays, runs the sharded forward + one train step (whose
material-gradient psum crosses the process boundary), and writes its own
point-cloud shard.  Results (loss, gradient checksum, local point count)
are dumped as JSON for the parent test to cross-check.
"""

import json
import os
import sys


def main() -> None:
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)

    import jax
    jax.config.update("jax_platforms", "cpu")

    # initialize the distributed runtime BEFORE importing any compute
    # module (module-level jnp constants would initialize the backend);
    # parallel.multihost is deliberately import-light for exactly this
    from lidar_brdf_tpu.parallel import multihost
    multihost.initialize_distributed()

    import numpy as np
    import jax.numpy as jnp

    from lidar_brdf_tpu.api import build_rays, build_scene_bvh
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    from lidar_brdf_tpu.parallel import shard as shard_mod
    from lidar_brdf_tpu.physics.returns import SimScalars
    from lidar_brdf_tpu.utils import noise as noise_mod
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id, jax.process_index()
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    # deterministic scene + full scan config, identical on every host
    rng = np.random.default_rng(3)
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
    full_rays = build_rays(cfg, scene)
    P_total = full_rays.num_pulses
    assert P_total % (2 * num_procs) == 0, P_total

    # every host generates ONLY its own pulse range
    lo, hi = multihost.process_pulse_range(P_total)
    assert hi - lo == P_total // num_procs, (lo, hi)
    local_rays = multihost.host_local_rays(full_rays, P_total)
    np.testing.assert_array_equal(np.asarray(local_rays.origin),
                                  np.asarray(full_rays.origin)[lo:hi])

    mesh = multihost.global_ray_mesh()
    rays = multihost.global_rays(local_rays, mesh)
    assert rays.origin.shape[0] == P_total      # global shape, local shards

    materials = MaterialLibrary.default().table_at(1064)
    scalars = SimScalars.from_config(cfg, 0.0)
    noise = noise_mod.make_sim_noise(jax.random.PRNGKey(0))
    scene, bvh, materials, scalars, noise = shard_mod.replicate(
        (scene, bvh, materials, scalars, noise), mesh)

    fwd = shard_mod.sharded_forward(mesh, cfg, scene_has_water=False)
    cloud = fwd(scene, bvh, materials, rays, noise, scalars)

    local_cloud = multihost.host_local_cloud(cloud)
    n_local = int(local_cloud.mask.sum())
    shard_path = multihost.write_host_shard(
        os.path.join(outdir, "cloud"), local_cloud)

    # one train step: the material-parameter gradient psum crosses hosts
    target = jnp.where(cloud.mask, cloud.intensity * 1.3, 0.0)
    step = shard_mod.sharded_train_step(mesh, cfg, scene_has_water=False)
    loss, _, grads = step(scene, bvh, materials, rays, noise, scalars,
                          target)
    loss = float(jax.device_get(loss))
    grad_sum = float(sum(jnp.sum(jnp.abs(g)).item() for g in grads))

    with open(os.path.join(outdir, f"result{proc_id}.json"), "w") as fh:
        json.dump({"proc": proc_id, "lo": lo, "hi": hi,
                   "n_local": n_local, "loss": loss,
                   "grad_sum": grad_sum, "shard": shard_path}, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
