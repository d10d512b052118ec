"""Hardware smoke test: Mosaic-compiled Pallas kernels vs the brute oracle.

CI runs the Pallas kernels in interpret mode only (tests/test_pallas.py);
this script exercises the REAL Mosaic compilation path on whatever TPU
backend is attached (the axon tunnel names itself after the plugin) and
asserts hit parity with the brute-force oracle.  Run via
``RUN_TPU_TESTS=1 pytest tests/test_tpu_hardware.py`` or directly:

    python scripts/tpu_smoke.py

Exits non-zero on any mismatch; prints one summary line on success.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fan_rays(n_side=16):
    o0 = np.array([0.0, 9.0, 0.0], np.float32)
    az = np.linspace(0, 2 * np.pi, n_side, endpoint=False)
    el = np.linspace(-1.2, -0.2, n_side)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    d = np.stack([np.cos(ee) * np.cos(aa), np.sin(ee),
                  np.cos(ee) * np.sin(aa)], -1).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return np.broadcast_to(o0, d.shape).copy(), d


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"no TPU backend attached (default={backend})", file=sys.stderr)
        return 2

    from lidar_brdf_tpu.geom import bvh as bvh_mod
    from lidar_brdf_tpu.geom.intersect import intersect_brute
    from lidar_brdf_tpu.io import synthetic
    from lidar_brdf_tpu.kernels.pulse_pallas import PulseLadderTraverser
    from lidar_brdf_tpu.kernels.traverse_pallas import (LANES,
                                                        PallasCulledTraverser)

    rng = np.random.default_rng(11)
    scene = synthetic.terrain_with_boxes(rng, num_boxes=6)
    tree = bvh_mod.build_bvh(np.asarray(scene.vertices),
                             np.asarray(scene.faces))
    o, d = _fan_rays()
    t0 = time.perf_counter()
    brute = jax.jit(intersect_brute, static_argnums=())(
        scene, jnp.asarray(o), jnp.asarray(d))
    fb = np.asarray(brute.face)
    tb = np.asarray(brute.t)
    hb = fb >= 0

    # tile kernel (Mosaic-compiled: interpret=False on the TPU backend)
    tile = PallasCulledTraverser(scene, tile_rays=LANES, interpret=False)
    hit = tile(jnp.asarray(o), jnp.asarray(d),
               tile.prepare(tree, o, d, t_max=500.0))
    hc = np.asarray(hit.face) >= 0
    assert (hc == hb).all(), "tile kernel hit mask mismatch"
    np.testing.assert_allclose(np.asarray(hit.t)[hc], tb[hb],
                               rtol=1e-4, atol=1e-4)

    # per-pulse ladder kernel
    R = 4
    ladder = PulseLadderTraverser(scene, rays_per_pulse=R, interpret=False)
    data = ladder.prepare(tree, o, d, t_max=500.0)
    hit_l = ladder(jnp.asarray(o.reshape(-1, R, 3)),
                   jnp.asarray(d.reshape(-1, R, 3)), data)
    hl = np.asarray(hit_l.face).reshape(-1) >= 0
    assert (hl == hb).all(), "ladder kernel hit mask mismatch"
    np.testing.assert_allclose(np.asarray(hit_l.t).reshape(-1)[hl], tb[hb],
                               rtol=1e-4, atol=1e-4)

    print(f"tpu_smoke ok: backend={backend} rays={o.shape[0]} "
          f"hits={int(hb.sum())} wall={time.perf_counter()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
