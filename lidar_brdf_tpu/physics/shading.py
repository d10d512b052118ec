"""Apply reflectance + radar equation to recorded returns.

TPU equivalent of `computeColor-comp.glsl:84-100`: one shading pass over all
recorded collisions after the bounce loop, choosing the measured-table,
analytic (`reflectIrradiance`) or Lambertian reflectance path, and the
bathymetric intensity branch when the previous return of the pulse hit a
water surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SensorConfig, ShadingMode
from ..core.types import MaterialTable, TriangleScene
from .brdf import analytic_brdf_factor, measured_brdf_factor
from .intensity import bathymetric_intensity, radar_intensity
from .returns import SimScalars, _unit
from .types import ReturnRecord


def shade_records(scene: TriangleScene, materials: MaterialTable,
                  records: ReturnRecord, final_winner_origin,
                  scalars: SimScalars, cfg: SensorConfig,
                  num_rays_pulse: int) -> jnp.ndarray:
    """Intensity for each (return level, pulse) record slot.

    ``final_winner_origin`` is the winner ray's origin after the bounce loop
    (reference reads post-loop `rayData`, `computeColor-comp.glsl:88,96`).

    All math runs on FLAT (levels*pulses,) shapes — (L, P) tensors get
    2-sublane T(L,128) layouts on TPU whose fusions measured ~3x less
    efficient (r5 bisection); the output reshapes back to the record shape.
    """
    rec_shape = records.mask.shape
    fl = lambda a: a.reshape((-1,) + a.shape[len(rec_shape):])
    records = jax.tree.map(fl, records)
    final_winner_origin = fl(final_winner_origin)
    mat = scene.comp_material[jnp.maximum(records.comp, 0)]
    L = _unit(final_winner_origin - records.point)
    N = _unit(records.normal)

    mode = cfg.shading_mode
    if mode == ShadingMode.MEASURED:
        brdf = measured_brdf_factor(materials, mat, L, N,
                                    hermite_t=cfg.hermite_t,
                                    mode=cfg.brdf_interpolation)
    elif mode == ShadingMode.ANALYTIC:
        brdf = analytic_brdf_factor(materials, mat, N,
                                    prev_dir=records.direction,
                                    angle_deg=records.angle,
                                    tangent=records.direction)
    else:  # LAMBERTIAN
        brdf = jnp.abs(jnp.sum(L * N, axis=-1))

    ray_power = scalars.peak_power / jnp.float32(num_rays_pulse)
    normal_i = radar_intensity(
        records.distance, ray_power, records.num_intersected, brdf,
        sensor_diameter=scalars.sensor_diameter,
        reflectance_weight=scalars.reflectance_weight,
        atmospheric_attenuation=scalars.atmospheric_attenuation,
        system_attenuation=scalars.system_attenuation)

    if cfg.bathymetric:
        bathy_i = bathymetric_intensity(
            records.distance, ray_power, brdf,
            start_point=records.start, hit_point=records.point,
            prev_hit_point=records.prev_point, direction=records.direction,
            sensor_diameter=scalars.sensor_diameter,
            reflectance_weight=scalars.reflectance_weight,
            atmospheric_attenuation=scalars.atmospheric_attenuation,
            water_height=scalars.water_height)
        intensity = jnp.where(records.prev_was_water, bathy_i, normal_i)
    else:
        intensity = normal_i
    return jnp.where(records.mask, intensity, 0.0).reshape(rec_shape)
