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

RAY_AXIS = "rays"


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


def sharded_forward(mesh: Mesh, cfg: SensorConfig, *, scene_has_water=False,
                    traverse_fn=None):
    """Build a jitted sharded forward pass: PointCloud sharded over pulses."""

    @functools.partial(jax.jit)
    def fwd(scene, bvh, materials, rays, noise_buf, scalars):
        def local(scene, bvh, materials, rays, noise_buf, scalars):
            return simulate_chunk(scene, bvh, materials, rays, noise_buf,
                                  scalars, cfg,
                                  scene_has_water=scene_has_water,
                                  traverse_fn=traverse_fn)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(RAY_AXIS), P(), P()),
            out_specs=P(RAY_AXIS),
            check_vma=False,
        )(scene, bvh, materials, rays, noise_buf, scalars)

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
                       learning_rate=1e-3):
    """Jitted step: forward + backward with material-parameter gradients.

    Loss: L2 between simulated intensity and a target intensity image (the
    differentiable-rendering use case from BASELINE.json — fit BRDF tables /
    material params to observed returns).  Gradients of the replicated
    material parameters are `psum`-reduced across the ray shards (inserted
    by the shard_map transpose; on hardware this is the ICI all-reduce that
    overlaps the backward traversal).
    """

    @jax.jit
    def step(scene, bvh, materials, rays, noise_buf, scalars, target):
        def loss_leaves(leaves):
            mats = _with_float_leaves(materials, leaves)

            def local(scene, bvh, mats, rays, noise_buf, scalars, target):
                cloud = simulate_chunk(scene, bvh, mats, rays, noise_buf,
                                       scalars, cfg,
                                       scene_has_water=scene_has_water,
                                       traverse_fn=traverse_fn)
                pred = jnp.where(cloud.mask, cloud.intensity, 0.0)
                local_loss = jnp.sum((pred - target) ** 2)
                return jax.lax.psum(local_loss, RAY_AXIS)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(), P(RAY_AXIS), P(), P(), P(RAY_AXIS)),
                out_specs=P(),
                check_vma=False,
            )(scene, bvh, mats, rays, noise_buf, scalars, target)

        leaves = _float_leaves(materials)
        loss, grads = jax.value_and_grad(loss_leaves)(leaves)
        new_leaves = tuple(p - learning_rate * g
                           for p, g in zip(leaves, grads))
        return loss, _with_float_leaves(materials, new_leaves), grads

    return step
