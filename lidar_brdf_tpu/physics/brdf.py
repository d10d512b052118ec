"""BRDF evaluation: measured-table lookups and the analytic model library.

Measured path (`computeColor-comp.glsl:32-82`): each material has a 360x91
retro-reflectance table f_r(phi, theta) densely sampled from RGL/EPFL
measured BRDFs at wi == wo (`BRDFDatabase::sampleBSDF`, BRDFDatabase.cpp:
137-215).  Lookups map the surface-to-sensor direction L and normal N to
(x = azimuth bucket, y = |cos(L,N)| * 90) and interpolate raw / bilinear /
cubic-Hermite.  Everything is differentiable w.r.t. the tables.

Analytic path (`reflectIrradiance-comp.glsl:1-189`): 8 parametric models
(ideal specular/diffuse, Minnaert, Blinn-Phong, Cook-Torrance with
Beckmann-style NDF + min-Smith geometry + Schlick Fresnel, Ward anisotropic,
Oren-Nayar, Zohdi) selected per material — all fully differentiable w.r.t.
roughness / F0.

All functions are vectorized over a leading batch of hits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import BRDFInterpolation, BRDFModel
from ..core.types import MaterialTable

PHI_BUCKETS = 360
THETA_BUCKETS = 91
PI = jnp.float32(3.1415926535)


# ---------------------------------------------------------------------------
# Measured-table lookup
# ---------------------------------------------------------------------------

def table_angles(L, N):
    """Map (surface->sensor direction L, normal N) to table coordinates.

    Reference `computeColor-comp.glsl:72-82`:
      y = |dot(L, N)| * 90                  in [0, 90]
      x = (atan2(L.z, L.x) + pi/2) * 2      in degrees, wrapped mod 360
    """
    cos_ln = jnp.abs(jnp.sum(L * N, axis=-1))
    y = jnp.clip(cos_ln, 0.0, 1.0) * (PI / 2.0) * (180.0 / PI)
    # safe_arctan2: vertical rays (L.x = L.z = 0) have no azimuth; the
    # true derivative there is NaN and would poison the masked backward
    from ..utils.safemath import safe_arctan2
    x = (safe_arctan2(L[..., 2], L[..., 0]) + PI / 2.0) * 2.0 * (180.0 / PI)
    x = jnp.mod(x, 360.0)
    return x, y


def _gather(tables, mat_id, x_idx, y_idx):
    """tables: (M, 360, 91); all index args broadcastable integer arrays."""
    return tables[mat_id, x_idx, y_idx]


def lookup_raw(tables, mat_id, x, y):
    """Nearest-bucket lookup (`getRawInterpolation`)."""
    xi = jnp.mod(x.astype(jnp.int32), PHI_BUCKETS)
    yi = jnp.clip(y.astype(jnp.int32), 0, THETA_BUCKETS - 1)
    return _gather(tables, mat_id, xi, yi)


def _bilinear_elem_indices(mat, x0i, y0i):
    x1i = jnp.mod(x0i + 1, PHI_BUCKETS)
    # the reference clamps the upper neighbour to 89, not 90 (:41)
    y1i = jnp.clip(y0i + 1, 0, THETA_BUCKETS - 2)
    base = mat * (PHI_BUCKETS * THETA_BUCKETS)
    return jnp.stack([base + x0i * THETA_BUCKETS + y0i,
                      base + x1i * THETA_BUCKETS + y0i,
                      base + x0i * THETA_BUCKETS + y1i,
                      base + x1i * THETA_BUCKETS + y1i], axis=-1)


@jax.custom_vjp
def _bilinear_windows(tables, mat, x0i, y0i):
    """(..., 4) neighbourhood [v00, v10, v01, v11] — one row gather from a
    shifted-view window table (same pattern as `_hermite_windows`)."""
    def clamp_y1(t):
        # y -> min(y + 1, 89)
        return jnp.concatenate(
            [t[:, :, 1:THETA_BUCKETS - 1],
             t[:, :, THETA_BUCKETS - 2:THETA_BUCKETS - 1],
             t[:, :, THETA_BUCKETS - 2:THETA_BUCKETS - 1]], axis=2)
    x1 = jnp.roll(tables, -1, axis=1)
    win = jnp.stack([tables, x1, clamp_y1(tables), clamp_y1(x1)],
                    axis=-1).reshape(-1, 4)
    key = (mat * (PHI_BUCKETS * THETA_BUCKETS)
           + x0i * THETA_BUCKETS + y0i)
    return win[key]


def _bilinear_windows_fwd(tables, mat, x0i, y0i):
    return _bilinear_windows(tables, mat, x0i, y0i), \
        (tables.shape, mat, x0i, y0i)


def _bilinear_windows_bwd(res, g):
    shape, mat, x0i, y0i = res
    idx = _bilinear_elem_indices(mat, x0i, y0i)
    flat = jnp.zeros(shape[0] * shape[1] * shape[2], g.dtype).at[idx].add(g)
    return flat.reshape(shape), None, None, None


_bilinear_windows.defvjp(_bilinear_windows_fwd, _bilinear_windows_bwd)


def lookup_bilinear(tables, mat_id, x, y):
    """Bilinear lookup (`getLinearInterpolation`)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xf = x - x0
    yf = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), PHI_BUCKETS)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, THETA_BUCKETS - 1)
    mat = jnp.broadcast_to(jnp.asarray(mat_id, jnp.int32), x0i.shape)
    v = _bilinear_windows(tables, mat, x0i, y0i)
    return (v[..., 0] * (1 - xf) * (1 - yf) + v[..., 1] * xf * (1 - yf)
            + v[..., 2] * (1 - xf) * yf + v[..., 3] * xf * yf)


def hermite_matrix(t: float) -> jnp.ndarray:
    """Cardinal-spline basis with tension parameter ``t``.

    Row-major 4x4, matching the coefficient vector uploaded by
    `LiDARSimulation::prepareLiDARData` (LiDARSimulation.cpp:412-417).
    """
    return jnp.array([
        [-t, 2.0 - t, t - 2.0, t],
        [2.0 * t, t - 3.0, 3.0 - 2.0 * t, -t],
        [-t, 0.0, t, 0.0],
        [0.0, 1.0, 0.0, 0.0],
    ], jnp.float32)


def _hermite_elem_indices(mat, xi, yi):
    """(..., 8) flat element indices of the two 4-point neighbourhoods."""
    x_col = jnp.mod(xi - 1, PHI_BUCKETS)
    y_row = jnp.clip(yi - 1, 0, THETA_BUCKETS - 1)
    k = jnp.arange(4, dtype=jnp.int32)
    xs_k = jnp.mod(xi[..., None] + k - 1, PHI_BUCKETS)
    ys_k = jnp.clip(yi[..., None] + k - 1, 0, THETA_BUCKETS - 1)
    base = mat * (PHI_BUCKETS * THETA_BUCKETS)
    return jnp.concatenate(
        [(base + y_row)[..., None] + xs_k * THETA_BUCKETS,
         (base[..., None] + x_col[..., None] * THETA_BUCKETS) + ys_k],
        axis=-1)


@jax.custom_vjp
def _hermite_windows(tables, mat, xi, yi):
    """(..., 8) = [rx0..rx3, ry0..ry3] neighbourhood values.

    Forward: ONE row gather from a precomputed window table (shifted views
    of `tables`; building it is pure slicing) — TPU gathers are ~4x cheaper
    per row than per element.  Backward (custom): element-mode scatter-add
    of the 8 cotangents straight into the table (row-mode scatter is
    slower, and differentiating through the shifted views would pay it).
    """
    win = _window_table(tables)                    # (M*360*91, 8)
    key = (mat * (PHI_BUCKETS * THETA_BUCKETS)
           + xi * THETA_BUCKETS + yi)
    return win[key]


def _window_table(tables):
    """(M*360*91, 8) per-cell neighbourhood values via shifted views.

    views[k][m, x, y] = tables[m, (x+k-1) mod 360, clip(y-1, 0, 90)]  (rx_k)
    views[4+k][m, x, y] = tables[m, (x-1) mod 360, clip(y+k-1, 0, 90)] (ry_k)
    """
    def roll_x(t, s):
        return jnp.roll(t, -s, axis=1)

    def shift_y(t, s):
        # y -> clip(y + s, 0, 90)
        if s == 0:
            return t
        if s < 0:
            pad = jnp.repeat(t[:, :, :1], -s, axis=2)
            return jnp.concatenate([pad, t[:, :, :s]], axis=2)
        pad = jnp.repeat(t[:, :, -1:], s, axis=2)
        return jnp.concatenate([t[:, :, s:], pad], axis=2)

    views = [shift_y(roll_x(tables, k - 1), -1) for k in range(4)]
    views += [shift_y(roll_x(tables, -1), k - 1) for k in range(4)]
    return jnp.stack(views, axis=-1).reshape(-1, 8)


def _hermite_windows_fwd(tables, mat, xi, yi):
    return _hermite_windows(tables, mat, xi, yi), (tables.shape, mat, xi, yi)


def _hermite_windows_bwd(res, g):
    shape, mat, xi, yi = res
    idx = _hermite_elem_indices(mat, xi, yi)
    flat_grad = jnp.zeros(shape[0] * shape[1] * shape[2],
                          g.dtype).at[idx].add(g)
    return flat_grad.reshape(shape), None, None, None


_hermite_windows.defvjp(_hermite_windows_fwd, _hermite_windows_bwd)


def lookup_hermite(tables, mat_id, x, y, hermite: jnp.ndarray):
    """Separable cubic-Hermite (cardinal spline) lookup.

    Follows `getHermiteInterpolation` (`computeColor-comp.glsl:49-70`): a
    1-D cardinal spline along x at the base row, plus one along y at the base
    column, summed.  x neighbours wrap mod 360; y neighbours clamp to
    [0, 90].

    Both 4-point neighbourhoods come from `_hermite_windows` (row-gather
    forward, element-scatter backward; see its docstring).  NOTE: never use
    a slice-mode lax.gather here — its VJP is a slice-mode scatter-add that
    Mosaic lowers to a ~500 ms serial while-loop.
    """
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    xf = x - x0f
    yf = y - y0f
    xi = jnp.mod(x0f.astype(jnp.int32), PHI_BUCKETS)
    yi = jnp.clip(y0f.astype(jnp.int32), 0, THETA_BUCKETS - 1)
    mat = jnp.broadcast_to(jnp.asarray(mat_id, jnp.int32), xi.shape)

    # The reference evaluates the x-spline along row ys[0] = clip(yi-1) and
    # the y-spline along column xs[0] = (xi-1) mod 360 (:52-59); both
    # neighbourhoods are baked into the window table.
    both = _hermite_windows(tables, mat, xi, yi)   # (..., 8)
    rx = both[..., 0:4]
    ry = both[..., 4:8]

    # explicit spline arithmetic — jnp matmul would drag the gathered
    # values through bf16 on the MXU (and costs more than it saves at 4x4)
    def spline(r, f):
        c = [hermite[j, 0] * r[..., 0] + hermite[j, 1] * r[..., 1]
             + hermite[j, 2] * r[..., 2] + hermite[j, 3] * r[..., 3]
             for j in range(4)]
        return ((c[0] * f + c[1]) * f + c[2]) * f + c[3]

    return spline(rx, xf) + spline(ry, yf)


def measured_brdf_factor(materials: MaterialTable, mat_id, L, N,
                         hermite_t: float = 0.5,
                         mode: BRDFInterpolation = BRDFInterpolation.HERMITE):
    """BRDF factor from the measured tables, clamped to [0, 1]
    (`computeColor-comp.glsl:74-82`)."""
    x, y = table_angles(L, N)
    tables = materials.brdf_table
    if mode == BRDFInterpolation.RAW:
        val = lookup_raw(tables, mat_id, x, y)
    elif mode == BRDFInterpolation.BILINEAR:
        val = lookup_bilinear(tables, mat_id, x, y)
    else:
        val = lookup_hermite(tables, mat_id, x, y, hermite_matrix(hermite_t))
    return jnp.clip(val, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Analytic BRDF library (`reflectIrradiance-comp.glsl`)
# ---------------------------------------------------------------------------
# Shared conventions (mirroring the kernel):
#   normal        N  = hit normal
#   prev_dir      I  = incoming ray direction (unit, pointing at surface)
#   reflect_dir   V  = normalize(-I)  (back toward sensor; retro-geometry)
#   angle         a  = collision scan angle in *degrees mapped to [0,90]*;
#                      the kernel calls cos(angle) on that value, quirky but
#                      reproduced for parity via the caller-provided `cos_a`.

BLINN_PHONG_ROUGHNESS_MULTIPLIER = 100.0
MINNAERT_K = 1.5
WARD_ALPHA = (0.15, 0.75)
EPS = 1e-8


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _reflect(I, N):  # noqa: E741  (match GLSL naming)
    return I - 2.0 * _dot(N, I)[..., None] * N


def _half_vector(v, l):
    h = v + l
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), EPS)


def ideal_specular(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    # `idealSpecular`: note the kernel reflects (normal, prev_dir) in that
    # argument order, i.e. reflect(N, I) = N - 2*dot(I,N)*I.
    perfect = N - 2.0 * _dot(I, N)[..., None] * I
    perfect = perfect / jnp.maximum(
        jnp.linalg.norm(perfect, axis=-1, keepdims=True), EPS)
    d = jnp.abs(_dot(perfect, V))
    return jnp.where(d < EPS, ks, 0.0)


def ideal_diffuse(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    return kd * cos_a


def minnaert(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    d = _dot(N, V)
    return kd * jnp.power(jnp.maximum(cos_a * d, EPS), MINNAERT_K - 1.0)


def blinn_phong(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    h = _half_vector(V, -I)
    return (kd * cos_a
            + ks * jnp.power(jnp.maximum(_dot(N, h), EPS),
                             rough * BLINN_PHONG_ROUGHNESS_MULTIPLIER))


def cook_torrance(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    """`cookTorrance` (:96-112): Beckmann-style NDF, min-Smith geometry with
    roughness flip, Schlick Fresnel on max(F0) channel."""
    h = _half_vector(V, -I)
    dot_nh = _dot(h, N)
    nd_rough = jnp.maximum(rough, 1e-3)
    # normal distribution (uses material roughness)
    nh2 = jnp.maximum(dot_nh * dot_nh, 1e-6)
    r2 = nd_rough * nd_rough
    normal_dist = (1.0 / (r2 * nh2 * nh2)) * jnp.exp((nh2 - 1.0) / (r2 * nh2))
    # geometry term (uses 1 - roughness, per the kernel)
    dot_nl = _dot(N, -I)
    dot_nv = _dot(N, V)
    dot_hv = _dot(h, V)
    g1 = (2.0 * dot_nh * dot_nv) / jnp.where(jnp.abs(dot_hv) < EPS, EPS, dot_hv)
    g2 = (2.0 * dot_nh * dot_nl) / jnp.where(jnp.abs(dot_hv) < EPS, EPS, dot_hv)
    geom = jnp.minimum(1.0, jnp.minimum(g1, g2))
    # fresnel
    f = f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - dot_nh, 0.0, 1.0),
                                    5.0)[..., None]
    fres = jnp.max(f, axis=-1)
    denom = PI * jnp.where(jnp.abs(cos_a) < EPS, EPS, cos_a) \
        * jnp.where(jnp.abs(dot_nv) < EPS, EPS, dot_nv)
    return kd * cos_a + ks / PI + ks * (fres * geom * normal_dist) / denom


def ward_anisotropic(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    h = _half_vector(V, -I)
    binormal = jnp.cross(tangent, N)
    binormal = binormal / jnp.maximum(
        jnp.linalg.norm(binormal, axis=-1, keepdims=True), EPS)
    dot_ln = jnp.clip(_dot(-I, N), 0.0, 1.0)
    dot_nv = jnp.clip(_dot(N, V), 0.0, 1.0)
    dot_hx = _dot(h, tangent)
    dot_hy = _dot(h, binormal)
    dot_hn = _dot(h, N)
    ax, ay = WARD_ALPHA
    a_term = (dot_hx / ax) ** 2 + (dot_hy / ay) ** 2
    exp_factor = -2.0 * a_term / jnp.maximum(1.0 + dot_hn, EPS)
    spec = (1.0 / (4.0 * PI * ax * ay
                   * jnp.sqrt(jnp.maximum(dot_ln * dot_nv, 0.1))))
    return kd * cos_a + ks * spec * jnp.exp(exp_factor)


def oren_nayar(kd, ks, N, I, V, rough, f0, cos_a, tangent):
    dot_ln = jnp.clip(_dot(-I, N), 0.0, 1.0)
    dot_nv = jnp.clip(_dot(N, V), 0.0, 1.0)
    from ..utils.safemath import safe_arccos
    beta = safe_arccos(dot_ln)
    alpha = safe_arccos(dot_nv)
    r2 = rough * rough
    A = 1.0 - 0.5 * (r2 / (r2 + 0.33))
    B = 0.45 * (r2 / (r2 + 0.09))
    return kd * (A + B * jnp.maximum(0.0, dot_nv - dot_ln)
                 * jnp.sin(jnp.maximum(alpha, beta))
                 * jnp.cos(jnp.minimum(alpha, beta)))


_MODELS = [ideal_specular, ideal_diffuse, minnaert, blinn_phong,
           cook_torrance, ward_anisotropic, oren_nayar]


def analytic_brdf_factor(materials: MaterialTable, mat_id, N, prev_dir,
                         angle_deg, tangent, kd=1.0, ks=1.0):
    """Vectorized `reflectIrradiance`: evaluate all models, select by the
    per-material model id, clamp to [0, 1].

    ``angle_deg`` is the collision scan angle in the reference's [0, 90]
    convention; the kernel takes cos() of it directly (radians-of-degrees
    quirk preserved).  ZOHDI has no kernel implementation (switch falls
    through to 0), reproduced here by mapping it to zero.
    """
    I = prev_dir
    V = -I / jnp.maximum(jnp.linalg.norm(I, axis=-1, keepdims=True), EPS)
    rough = materials.roughness[mat_id]
    f0 = materials.reflectivity_f0[mat_id]
    model = materials.brdf_model[mat_id]
    cos_a = jnp.cos(angle_deg)
    kd = jnp.broadcast_to(jnp.asarray(kd, jnp.float32), cos_a.shape)
    ks = jnp.broadcast_to(jnp.asarray(ks, jnp.float32), cos_a.shape)

    vals = jnp.stack([fn(kd, ks, N, I, V, rough, f0, cos_a, tangent)
                      for fn in _MODELS], axis=-1)
    zero = jnp.zeros_like(cos_a)
    sel = jnp.clip(model, 0, len(_MODELS))  # ZOHDI (7) -> out-of-range
    picked = jnp.where(sel >= len(_MODELS), zero,
                       jnp.take_along_axis(
                           vals, jnp.minimum(sel, len(_MODELS) - 1)[..., None],
                           axis=-1)[..., 0])
    return jnp.clip(picked, 0.0, 1.0)
