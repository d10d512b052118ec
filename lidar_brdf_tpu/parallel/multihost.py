"""Multi-host execution support.

The reference has no distributed story (SURVEY.md §2.6); here the scaling
recipe is: `jax.distributed` init, a global ``rays`` mesh over all hosts'
chips (ICI within a host, DCN across), pulses sharded globally, scene
replicated, and per-host point-cloud shards written independently (PLY
gather is embarrassingly parallel; only material-parameter gradients cross
hosts, inside the jitted step via psum).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax
import numpy as np

if TYPE_CHECKING:  # import-light: `initialize_distributed` must be callable
    # before ANY jax backend initialization, and importing the compute
    # modules creates jnp constants (= a backend)
    from ..core.types import PointCloud, RayBundle

RAY_AXIS = "rays"     # mirrors shard.RAY_AXIS without importing shard


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """`jax.distributed.initialize` with env fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]))


def global_ray_mesh():
    """1-D mesh over every chip in the job (all hosts)."""
    from .shard import ray_mesh
    return ray_mesh(jax.devices())


def process_pulse_range(total_pulses: int) -> tuple[int, int]:
    """[start, end) pulse range owned by this host: pulses are sharded
    contiguously over processes (each host generates only its own rays)."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-total_pulses // n)
    return i * per, min((i + 1) * per, total_pulses)


def write_host_shard(path_prefix: str, cloud: PointCloud) -> str:
    """Write this host's point-cloud shard: `<prefix>.part<k>.ply`
    (the reference's single-process PLY writer generalized to per-host
    shards; concatenate offline or read all parts)."""
    from ..io.ply import write_ply
    path = f"{path_prefix}.part{jax.process_index()}.ply"
    write_ply(path, cloud)
    return path


def host_local_rays(rays: RayBundle, total_pulses: int) -> RayBundle:
    lo, hi = process_pulse_range(total_pulses)
    return jax.tree.map(lambda a: a[lo:hi], rays)


def global_rays(local_rays: RayBundle, mesh) -> RayBundle:
    """Assemble a globally-sharded RayBundle from this host's local pulses.

    Each process passes only its own `host_local_rays` slice; the result is
    one global jax.Array per leaf, sharded over the ``rays`` mesh axis, with
    no cross-host data movement (every host owns exactly the shards of the
    pulses it generated — the multi-host generalization of the reference's
    single-process ray SSBO upload)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sh, np.asarray(a)), local_rays)


def host_local_cloud(cloud: PointCloud) -> PointCloud:
    """This host's rows of a globally-sharded PointCloud as host numpy.

    Collects the addressable shards of every leaf (in shard-index order) —
    the per-host point-cloud slice to pass to `write_host_shard`; no
    cross-host gather is ever needed (PLY shards concatenate offline)."""
    def local(a):
        shards = sorted(a.addressable_shards, key=lambda s: s.index[0].start
                        if isinstance(s.index, tuple) and s.index
                        and s.index[0].start is not None else 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return jax.tree.map(local, cloud)
