"""Record pytrees produced by the return-extraction loop."""

from __future__ import annotations

from dataclasses import dataclass

import jax

_pytree = jax.tree_util.register_dataclass


@_pytree
@dataclass
class ReturnRecord:
    """One return slot per pulse (stacked over return levels upstream).

    Dense-masked equivalent of `TriangleCollisionGPUData` (`Model3D.h:
    153-176`) as written by `reduceCollisions-comp.glsl:225-233`.
    """

    mask: jax.Array             # (P,)  valid collision recorded
    point: jax.Array            # (P, 3)
    normal: jax.Array           # (P, 3)
    uv: jax.Array               # (P, 2)
    distance: jax.Array         # (P,)  corrected distance from sensor
    angle: jax.Array            # (P,)  scan angle in [0, 90]
    gps_time: jax.Array         # (P,)
    comp: jax.Array             # (P,)  model component id (-1 invalid)
    material: jax.Array         # (P,)  LiDAR material id of the component
    face: jax.Array             # (P,)
    num_intersected: jax.Array  # (P,)  merged rays in the footprint
    return_number: jax.Array    # (P,)  0-based return index
    winner_ray: jax.Array       # (P,)  index of winning ray within pulse
    start: jax.Array            # (P, 3) winner ray sensor origin
    direction: jax.Array        # (P, 3) winner ray direction at record time
    prev_was_water: jax.Array   # (P,)  previous return hit water surface
    prev_point: jax.Array       # (P, 3) previous return's hit point


@_pytree
@dataclass
class OutlierRecord:
    """Atmospheric outlier points (`addOutlier-comp.glsl:29-64`)."""

    mask: jax.Array       # (P,)
    point: jax.Array      # (P, 3)
    distance: jax.Array   # (P,)
