"""Multi-chip execution: rays sharded over a device mesh.

The reference is single-GPU (SURVEY.md §2.6); this module supplies the
missing scaling axis the TPU way: a 1-D ``rays`` mesh axis, pulses sharded
across chips with `shard_map`, scene/BVH/material state replicated in every
chip's HBM, and BRDF/material/pose gradients all-reduced with `psum` riding
the ICI (overlap is XLA's job; we only express the collective).

Per-ray work is embarrassingly parallel — no halo exchange is ever needed —
so scaling efficiency is bounded only by the final gradient all-reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 top-level, older under experimental
    from jax import shard_map as _shard_map_mod
    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") \
        else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..core.config import SensorConfig
from ..core.types import MaterialTable, RayBundle
from ..runtime.simulate import simulate_chunk

from .multihost import RAY_AXIS  # single definition; multihost is import-light


def ray_mesh(devices=None) -> Mesh:
    """Flat 1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    import numpy as np
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def shard_rays(rays: RayBundle, mesh: Mesh) -> RayBundle:
    """Device-put rays with the pulse axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), rays)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def build_sharded_buckets(traverser, bvh, rays: RayBundle, mesh: Mesh,
                          t_max: float | None = None):
    """Per-device beam-culled candidate buckets, stacked on a device axis.

    Pulses shard evenly over the mesh; each shard's buckets are built on the
    host against its local rays (tile ids are shard-local).  Shards can
    produce different bucket ladders, so all shards are normalized to the
    union ladder (missing buckets become a single dummy tile) and padded to
    common tile counts.  Returns a tuple of (tile_idx (D, B), cand (D, B, C))
    pairs ready to shard with `P(RAY_AXIS)` on axis 0.
    """
    import numpy as np
    n_dev = mesh.devices.size
    P_total = rays.num_pulses
    if P_total % n_dev:
        raise ValueError(f"{P_total} pulses not divisible by {n_dev} devices")
    per = P_total // n_dev
    origin = np.asarray(rays.origin)
    direction = np.asarray(rays.direction)
    shard_buckets = []
    for d in range(n_dev):
        sl = slice(d * per, (d + 1) * per)
        shard_buckets.append(dict(
            (cand.shape[1], (tidx, cand))
            for tidx, cand in traverser.build_buckets(
                bvh, origin[sl], direction[sl], t_max=t_max)))
    n_tiles = (per * rays.rays_per_pulse
               + traverser.tile_rays - 1) // traverser.tile_rays
    ladder = sorted({c for sb in shard_buckets for c in sb})
    out = []
    for C in ladder:
        B = max(sb[C][0].shape[0] if C in sb else 1 for sb in shard_buckets)
        tidx = np.full((n_dev, B), n_tiles, np.int32)
        cand = np.full((n_dev, B, C), -1, np.int32)
        for d, sb in enumerate(shard_buckets):
            if C in sb:
                t, c = sb[C]
                tidx[d, :t.shape[0]] = t
                cand[d, :c.shape[0]] = c
        out.append((tidx, cand))
    return tuple(out)


def build_sharded_traverse_data(traverser, bvh, rays: RayBundle, mesh: Mesh,
                                t_max: float | None = None):
    """Per-device traverse_data for any traverser, stacked on a device axis.

    Dispatches to the traverser's own ``prepare_sharded`` when it has one
    (``PulseLadderTraverser``); otherwise falls back to the tile-bucket
    scheme of :func:`build_sharded_buckets`.  Either way the result is a
    pytree whose every leaf has a leading ``(n_devices,)`` axis — shard it
    with :func:`shard_traverse_data` and each device sees exactly the
    single-device ``prepare`` structure inside ``shard_map``.
    """
    if hasattr(traverser, "prepare_sharded"):
        import numpy as np
        return traverser.prepare_sharded(
            bvh, np.asarray(rays.origin), np.asarray(rays.direction),
            mesh.devices.size, t_max=t_max)
    return build_sharded_buckets(traverser, bvh, rays, mesh, t_max=t_max)


def shard_traverse_data(data, mesh: Mesh):
    """Device-put stacked traverse_data with the device axis sharded."""
    sh = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), data)


# back-compat alias: tile buckets are one instance of stacked traverse_data
shard_buckets_put = shard_traverse_data


def _local_traverse_data(data):
    """Inside shard_map: drop the (length-1) device axis from every leaf."""
    return jax.tree.map(lambda a: a[0], data)


def sharded_forward(mesh: Mesh, cfg: SensorConfig, *, scene_has_water=False,
                    traverse_fn=None):
    """Build a jitted sharded forward pass: PointCloud sharded over pulses."""

    @functools.partial(jax.jit)
    def fwd(scene, bvh, materials, rays, noise_buf, scalars, buckets=None):
        bleaves, btree = jax.tree.flatten(buckets)

        def local(scene, bvh, materials, rays, noise_buf, scalars, *bl):
            data = None
            if bl:
                data = _local_traverse_data(jax.tree.unflatten(btree, bl))
            return simulate_chunk(scene, bvh, materials, rays, noise_buf,
                                  scalars, cfg,
                                  scene_has_water=scene_has_water,
                                  traverse_fn=traverse_fn,
                                  traverse_data=data)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(RAY_AXIS), P(), P())
            + (P(RAY_AXIS),) * len(bleaves),
            out_specs=P(RAY_AXIS),
            check_vma=False,
        )(scene, bvh, materials, rays, noise_buf, scalars, *bleaves)

    return fwd


def _float_leaves(materials: MaterialTable):
    return (materials.refractive_index, materials.roughness,
            materials.brdf_table, materials.reflectivity_f0)


def _with_float_leaves(materials: MaterialTable, leaves) -> MaterialTable:
    ri, rough, table, f0 = leaves
    return MaterialTable(refractive_index=ri, roughness=rough,
                         brdf_table=table, brdf_model=materials.brdf_model,
                         reflectivity_f0=f0)


def sharded_train_step(mesh: Mesh, cfg: SensorConfig, *,
                       scene_has_water=False, traverse_fn=None,
                       learning_rate=1e-3, grad_params: str = "materials"):
    """Jitted step: forward + backward over the mesh.

    Loss: L2 between simulated intensity and a target intensity image (the
    differentiable-rendering use case from BASELINE.json — fit parameters
    to observed returns).  Gradients of REPLICATED parameters are
    `psum`-reduced across the ray shards (inserted by the shard_map
    transpose; on hardware this is the ICI all-reduce that overlaps the
    backward traversal).

    ``grad_params``:
      * "materials" — material leaves only (BRDF table, n(λ), roughness,
        f0); returns (loss, updated_materials, material_grads).
      * "full" — the BASELINE north-star set: material leaves + scene
        vertices (replicated → vertex grads cross chips in the same psum)
        + ray origins (sharded with the rays → pose grads stay on-chip);
        returns (loss, updated_materials,
        {"materials": ..., "vertices": ..., "origin": ...}).
    """

    @jax.jit
    def step(scene, bvh, materials, rays, noise_buf, scalars, target,
             buckets=None):
        bleaves, btree = jax.tree.flatten(buckets)

        def loss_fn(leaves, verts, origin):
            mats = _with_float_leaves(materials, leaves)
            scn = scene if verts is None else \
                scene.__class__(**{**scene.__dict__, "vertices": verts})
            rays_ = rays if origin is None else \
                rays.__class__(origin=origin, direction=rays.direction,
                               gps_time=rays.gps_time)

            def local(scn, bvh, mats, rays, noise_buf, scalars, target,
                      *bl):
                data = None
                if bl:
                    data = _local_traverse_data(jax.tree.unflatten(btree, bl))
                cloud = simulate_chunk(scn, bvh, mats, rays, noise_buf,
                                       scalars, cfg,
                                       scene_has_water=scene_has_water,
                                       traverse_fn=traverse_fn,
                                       traverse_data=data)
                pred = jnp.where(cloud.mask, cloud.intensity, 0.0)
                local_loss = jnp.sum((pred - target) ** 2)
                return jax.lax.psum(local_loss, RAY_AXIS)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(), P(RAY_AXIS), P(), P(), P(RAY_AXIS))
                + (P(RAY_AXIS),) * len(bleaves),
                out_specs=P(),
                check_vma=False,
            )(scn, bvh, mats, rays_, noise_buf, scalars, target, *bleaves)

        leaves = _float_leaves(materials)
        if grad_params == "full":
            loss, (g_mat, g_verts, g_origin) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(leaves, scene.vertices,
                                            rays.origin)
            grads = {"materials": g_mat, "vertices": g_verts,
                     "origin": g_origin}
            new_leaves = tuple(p - learning_rate * g
                               for p, g in zip(leaves, g_mat))
        else:
            loss, grads = jax.value_and_grad(
                lambda lv: loss_fn(lv, None, None))(leaves)
            new_leaves = tuple(p - learning_rate * g
                               for p, g in zip(leaves, grads))
        return loss, _with_float_leaves(materials, new_leaves), grads

    return step
