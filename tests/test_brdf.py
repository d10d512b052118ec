"""Golden-value unit tests for BRDF lookups, analytic models, intensity."""

import numpy as np
import jax.numpy as jnp

from lidar_brdf_tpu.core.config import BRDFInterpolation, BRDFModel
from lidar_brdf_tpu.core.types import MaterialTable
from lidar_brdf_tpu.physics import brdf as brdf_mod
from lidar_brdf_tpu.physics import intensity as int_mod


def make_materials(tables):
    M = tables.shape[0]
    return MaterialTable(
        refractive_index=jnp.ones(M),
        roughness=jnp.full(M, 0.5),
        brdf_table=jnp.asarray(tables),
        brdf_model=jnp.full(M, int(BRDFModel.IDEAL_DIFFUSE), jnp.int32),
        reflectivity_f0=jnp.full((M, 3), 0.04),
    )


def test_table_angle_mapping():
    # L parallel to N -> y = 90 (normal incidence bucket)
    L = jnp.array([[0.0, 1.0, 0.0]])
    N = jnp.array([[0.0, 1.0, 0.0]])
    x, y = brdf_mod.table_angles(L, N)
    assert abs(float(y[0]) - 90.0) < 1e-4
    # grazing: y = 0
    L2 = jnp.array([[1.0, 0.0, 0.0]])
    x2, y2 = brdf_mod.table_angles(L2, N)
    assert abs(float(y2[0])) < 1e-4
    # azimuth mapping: (atan2(z,x)+pi/2)*2 in degrees mod 360
    L3 = jnp.array([[0.0, 0.0, 1.0]])     # atan2 = pi/2 -> x = 360 -> 0
    x3, _ = brdf_mod.table_angles(L3, N)
    assert abs(float(x3[0]) % 360.0) < 1e-3


def test_raw_and_bilinear_lookup_exact_buckets():
    tables = np.zeros((1, 360, 91), np.float32)
    tables[0, 10, 20] = 0.5
    mats = make_materials(tables)
    mat_id = jnp.zeros(1, jnp.int32)
    val = brdf_mod.lookup_raw(mats.brdf_table, mat_id,
                              jnp.array([10.2]), jnp.array([20.4]))
    assert abs(float(val[0]) - 0.5) < 1e-6
    # bilinear at the exact bucket returns the bucket value
    val2 = brdf_mod.lookup_bilinear(mats.brdf_table, mat_id,
                                    jnp.array([10.0]), jnp.array([20.0]))
    assert abs(float(val2[0]) - 0.5) < 1e-6
    # halfway between two x-buckets averages them
    tables[0, 11, 20] = 1.0
    mats2 = make_materials(tables)
    val3 = brdf_mod.lookup_bilinear(mats2.brdf_table, mat_id,
                                    jnp.array([10.5]), jnp.array([20.0]))
    assert abs(float(val3[0]) - 0.75) < 1e-6


def test_bilinear_x_wraps_around():
    tables = np.zeros((1, 360, 91), np.float32)
    tables[0, 359, 0] = 1.0
    tables[0, 0, 0] = 0.0
    mats = make_materials(tables)
    val = brdf_mod.lookup_bilinear(mats.brdf_table, jnp.zeros(1, jnp.int32),
                                   jnp.array([359.5]), jnp.array([0.0]))
    assert abs(float(val[0]) - 0.5) < 1e-6


def test_hermite_interpolates_constant_table():
    # A constant table must interpolate to x-row value + y-col value = 2c
    # per the reference's additive x/y spline structure... verify against a
    # directly computed reference at a known point instead.
    tables = np.full((1, 360, 91), 0.25, np.float32)
    mats = make_materials(tables)
    H = brdf_mod.hermite_matrix(0.5)
    val = brdf_mod.lookup_hermite(mats.brdf_table, jnp.zeros(1, jnp.int32),
                                  jnp.array([100.3]), jnp.array([45.7]), H)
    # constant c: each 1-D cardinal spline reproduces c; x-spline + y-spline
    # therefore gives 2c (additive quirk preserved from the reference).
    assert abs(float(val[0]) - 0.5) < 1e-5


def test_hermite_matches_manual_polynomial():
    rng = np.random.default_rng(0)
    tables = rng.uniform(0, 1, (1, 360, 91)).astype(np.float32)
    mats = make_materials(tables)
    t = 0.5
    H = np.asarray(brdf_mod.hermite_matrix(t))
    x, y = 33.4, 50.6
    xi, yi = int(x), int(y)
    xf, yf = x - xi, y - yi
    xs = [(xi + k - 1) % 360 for k in range(4)]
    ys = [min(max(yi + k - 1, 0), 90) for k in range(4)]
    rx = np.array([tables[0, xs[k], ys[0]] for k in range(4)])
    ry = np.array([tables[0, xs[0], ys[k]] for k in range(4)])
    ax, bx, cx, dx = H @ rx
    ay, by, cy, dy = H @ ry
    expect = (((ax * xf + bx) * xf + cx) * xf + dx) \
        + (((ay * yf + by) * yf + cy) * yf + dy)
    got = brdf_mod.lookup_hermite(mats.brdf_table, jnp.zeros(1, jnp.int32),
                                  jnp.array([x]), jnp.array([y]), jnp.asarray(H))
    assert abs(float(got[0]) - expect) < 1e-5


def test_analytic_models_sane():
    M = 7
    mats = MaterialTable(
        refractive_index=jnp.ones(M),
        roughness=jnp.full(M, 0.4),
        brdf_table=jnp.zeros((M, 360, 91)),
        brdf_model=jnp.arange(M, dtype=jnp.int32),
        reflectivity_f0=jnp.full((M, 3), 0.1))
    N = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (M, 1))
    I = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (M, 1))   # straight down
    angle = jnp.zeros(M)
    tangent = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (M, 1))
    vals = brdf_mod.analytic_brdf_factor(
        mats, jnp.arange(M, dtype=jnp.int32), N, I, angle, tangent)
    v = np.asarray(vals)
    assert v.shape == (M,)
    assert (v >= 0).all() and (v <= 1).all()
    # ideal diffuse at normal incidence with kd=1, cos(0)=1 -> 1
    assert abs(v[int(BRDFModel.IDEAL_DIFFUSE)] - 1.0) < 1e-5


def test_radar_equation_golden():
    # I = P*D^2*brdf*w*atm*att / (4 d^2); with d=10, a=2.0:
    # atm = 10^(-2*10*2/1e4) = 10^-0.004
    val = int_mod.radar_intensity(
        jnp.array([10.0]), jnp.float32(6.5), jnp.array([10], jnp.int32),
        jnp.array([0.8]), sensor_diameter=jnp.float32(0.2),
        reflectance_weight=jnp.float32(1.0),
        atmospheric_attenuation=jnp.float32(2.0),
        system_attenuation=jnp.float32(1.0))
    atm = 10 ** (-2 * 10 * 2.0 / 1e4)
    expect = (6.5 * 10 * 0.2 ** 2 * 0.8 * atm) / (4 * 100.0)
    assert abs(float(val[0]) - expect) < 1e-7


def test_atmospheric_attenuation_monotone():
    a = int_mod.atmospheric_factor(jnp.array([10.0, 100.0, 1000.0]),
                                   jnp.float32(1.0))
    a = np.asarray(a)
    assert (np.diff(a) < 0).all()
    assert a[0] <= 1.0
