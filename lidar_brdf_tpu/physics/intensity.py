"""Radar-equation intensity synthesis.

Parity with `computeIntensity-comp.glsl:4-39`:

  I = P_pulse * D^2 * brdf * w_refl * atm(d) * att_sys / (4 d^2)
  atm(d) = 10^(-2 d a / 1e4)

plus the bathymetric variant used when the *previous* return of the pulse
hit a water surface under a green (<533nm) aerial scan: refraction geometry
through the interface with exponential depth decay.
All differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = jnp.float32(3.1415926535)
WATER_DIFFUSE_MAX = jnp.float32(0.5)      # max of vec3(0.45, 0.48, 0.5)
WATER_REFRACTIVE = jnp.float32(1.33)


def atmospheric_factor(distance, attenuation):
    """`getAttenuation`: 10^(-2 d a / 10^4)."""
    return jnp.power(10.0, -2.0 * distance * attenuation / 1.0e4)


def radar_intensity(distance, ray_power, num_intersected_rays, brdf_factor,
                    *, sensor_diameter, reflectance_weight,
                    atmospheric_attenuation, system_attenuation):
    """Standard (non-bathymetric) return intensity."""
    d2 = jnp.maximum(distance * distance, 1e-12)
    pulse_power = ray_power * num_intersected_rays.astype(jnp.float32)
    diam2 = sensor_diameter * sensor_diameter
    atm = atmospheric_factor(distance, atmospheric_attenuation)
    return (pulse_power * diam2 * brdf_factor * reflectance_weight
            * atm * system_attenuation) / (4.0 * d2)


def bathymetric_intensity(distance, ray_power, brdf_factor, *,
                          start_point, hit_point, prev_hit_point, direction,
                          sensor_diameter, reflectance_weight,
                          atmospheric_attenuation, water_height):
    """`computeBathymetricIntensity`: underwater return through refraction.

    ``prev_hit_point`` is the water-surface collision of the same pulse;
    ``direction`` is the refracted in-water ray direction.
    """
    receiver_area = PI * (sensor_diameter / 2.0) ** 2
    altitude = start_point[..., 1] - water_height
    depth = water_height - hit_point[..., 1]
    tdir = prev_hit_point - start_point
    from ..utils.safemath import safe_unit
    tdir = safe_unit(tdir)
    transmit_cos = -tdir[..., 1]                       # dot(tdir, (0,-1,0))
    denom = WATER_REFRACTIVE * altitude + depth
    from ..utils.safemath import safe_arccos
    water_angle = safe_arccos(-direction[..., 1])
    cos_wa = jnp.cos(water_angle)
    hyp = depth / jnp.where(jnp.abs(cos_wa) < 1e-6, 1e-6, cos_wa)
    sinus = jnp.sin(water_angle) * hyp
    atm = atmospheric_factor(distance, atmospheric_attenuation)
    intensity = (ray_power * brdf_factor * receiver_area
                 * transmit_cos * transmit_cos * reflectance_weight
                 * atm * 100.0) / (PI * jnp.maximum(denom * denom, 1e-12))
    decay = jnp.exp(-2.0 * WATER_DIFFUSE_MAX * depth * hyp
                    / jnp.where(jnp.abs(sinus) < 1e-6, 1e-6, sinus))
    return intensity * decay
