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

import jax
import numpy as np

from ..core.types import PointCloud, RayBundle
from .shard import RAY_AXIS, ray_mesh


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
