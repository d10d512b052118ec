"""Gradient-safe elementary ops (value-preserving).

Dense masked pipelines compute every slot and select with `jnp.where`;
`where` zeroes the *cotangent* of the unselected branch, but `0 * inf` and
`0 * nan` are still NaN, so a single |x|=1 arccos, zero-vector normalize,
or sqrt(0) in a masked slot poisons the WHOLE gradient (observed: vertex
gradients going NaN for pulses with no valid hit).  These helpers keep the
forward value bit-identical on the well-defined domain and bound the
derivative everywhere else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(v, axis=-1, eps: float = 1e-24):
    """|v| with finite gradient at v=0 (sqrt(sum+eps); value shift <=
    sqrt(eps), far below f32 resolution of any real distance)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + eps)


def safe_unit(v, eps: float = 1e-24):
    """v/|v| with finite gradient at v=0 (returns ~0 there)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps))


def safe_arccos(x, eps: float = 1e-6):
    """arccos with the EXACT value of arccos(clip(x, -1, 1)) but the
    gradient evaluated at clip(x, -1+eps, 1-eps) — bounded instead of the
    true infinite slope at |x| = 1 (reached by e.g. perfectly horizontal
    or vertical rays)."""
    xc = jnp.clip(x, -1.0, 1.0)
    xg = jnp.clip(xc, -1.0 + eps, 1.0 - eps)
    ag = jnp.arccos(xg)
    return ag + jax.lax.stop_gradient(jnp.arccos(xc) - ag)


def safe_arctan2(y, x, eps: float = 1e-12):
    """arctan2 with the EXACT forward value of atan2(y, x) everywhere, but
    the gradient redirected to a regularized evaluation near the degenerate
    axis y=x=0 (vertical rays have no azimuth; the reference hits the same
    singularity).  Same stop_gradient residual trick as `safe_arccos`: the
    true value rides along as a constant, so tiny-but-nonzero (y, x) keep
    their real azimuth (previously they snapped to 0, shifting the BRDF
    table x-coordinate for near-vertical L)."""
    r2 = y * y + x * x
    ok = r2 > eps
    ag = jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))
    return ag + jax.lax.stop_gradient(jnp.arctan2(y, x) - ag)


def safe_sqrt(x, eps: float = 1e-24):
    """sqrt(max(x, 0)) with a finite gradient at x <= 0."""
    ok = x > eps
    val = jnp.sqrt(jnp.where(ok, x, 1.0))
    return jnp.where(ok, val, 0.0)
