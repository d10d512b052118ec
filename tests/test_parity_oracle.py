"""End-to-end numerical parity oracle.

A scalar numpy transcription of the reference pipeline math —
`reduceCollisions-comp.glsl:175-244` (winner select, footprint merge,
validate, shiny/terrain errors, bounce state), `addOutlier-comp.glsl:29-64`,
`computeColor-comp.glsl:32-100` (Hermite table lookup) and
`computeIntensity-comp.glsl:4-39` (radar equation + bathymetric branch) —
driven by the same scene / rays / noise buffer as the jitted pipeline, then
asserted allclose on positions, intensities, return structure and outliers.

The oracle is written as naive per-pulse Python loops with brute-force
nearest-triangle intersection, sharing NO code with the pipeline except the
noise-stream layout (an input convention) and the config scalars.  If any
merged pipeline semantic drifts from the reference formulas, this test
fails.

Documented deviations from the reference that the oracle follows too:
  * noise values come from a seeded counter-PRNG buffer laid out in streams
    (utils/noise.py) instead of a wall-clock-seeded mt19937 SSBO;
  * the refraction interface normal is oriented against the incident ray
    (the reference trusts mesh winding);
  * next-bounce origins use each ray's own collision point (the reference
    aliases ray slot 0 onto the winner's error-shifted copy — a buffer
    reuse artifact, see reduceCollisions-comp.glsl:158 with
    rayCollision[rayOffset] overwritten at :225).
"""

import functools
import math

import jax
import numpy as np
import pytest

from lidar_brdf_tpu.api import build_scene_bvh
from lidar_brdf_tpu.core.config import (BRDFInterpolation, LiDARType,
                                        SensorConfig, ShadingMode)
from lidar_brdf_tpu.core.types import (RayBundle, SURFACE_TERRAIN,
                                       SURFACE_WATER)
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.io.materials import MaterialLibrary
from lidar_brdf_tpu.physics.returns import (OUTLIER_LEVEL_STRIDE, SimScalars)
from lidar_brdf_tpu.runtime.simulate import simulate_chunk
from lidar_brdf_tpu.utils import noise as noise_mod

LIGHT_SPEED = 299792458.0
PI = 3.1415926535  # f32 literal used by the kernels

# `reduceCollisions-comp.glsl:11-19`
HORIZONTAL_TERRAIN_ERROR_W = 1.0 / 1000.0
VERTICAL_TERRAIN_ERROR_HEIGHT_W = 1e-4
VERTICAL_TERRAIN_ERROR_ANGLE_W = 0.5
SHINY_DISTANCE_WEIGHT = 1.0 / 200.0
SHINY_MODEL_WEIGHT = 1.0 / 80.0
SHINY_INDIVIDUAL_ERROR = 1.0 / 100.0
WATER_DIFFUSE_MAX = 0.5
WATER_REFRACTIVE = 1.33


# --------------------------------------------------------------------------
# scene / rays / noise fixtures
# --------------------------------------------------------------------------

def parity_scene():
    """Six-triangle scene: terrain ground, elevated shelf, water patch."""
    gv, gf = synthetic.ground_plane(half=20.0, y=0.0)          # comp 0
    sv, sf = synthetic.ground_plane(half=4.0, y=3.0)           # comp 1
    sv = sv + np.array([-6.0, 0.0, 0.0], np.float32)
    wv, wf = synthetic.ground_plane(half=4.0, y=0.5)           # comp 2
    wv = wv + np.array([6.0, 0.0, 0.0], np.float32)
    v = np.concatenate([gv, sv, wv])
    f = np.concatenate([gf, sf + len(gv), wf + len(gv) + len(sv)])
    comp = np.concatenate([np.zeros(len(gf), np.int32),
                           np.full(len(sf), 1, np.int32),
                           np.full(len(wf), 2, np.int32)])
    ks = np.concatenate([np.full(len(gv), 0.15, np.float32),
                         np.full(len(sv), 0.9, np.float32),
                         np.full(len(wv), 0.3, np.float32)])
    ns = np.concatenate([np.full(len(gv), 1.0, np.float32),
                         np.full(len(sv), 1.2, np.float32),
                         np.full(len(wv), 1.0, np.float32)])
    return synthetic.scene_from_arrays(
        v, f, comp_of_face=comp, num_components=3,
        comp_material=np.array([7, 8, 6], np.int32),     # STONE, WOOD, WATER
        comp_surface=np.array([SURFACE_TERRAIN, 0, SURFACE_WATER], np.int32),
        comp_asprs=np.array([2, 6, 9], np.int32),
        vertex_ks=ks, vertex_ns=ns)


def parity_rays(P=96, R=3):
    """Grid of downward pulses with slight tilt; 3-ray discs wide enough to
    straddle the shelf/water edges (multi-return + merge decisions)."""
    rng = np.random.default_rng(7)
    side = 8
    assert P % side == 0
    xs = np.linspace(-9.0, 9.0, side)
    zs = np.linspace(-7.0, 7.0, P // side)
    cx, cz = np.meshgrid(xs, zs, indexing="ij")
    cx, cz = cx.ravel()[:P], cz.ravel()[:P]
    origin0 = np.stack([cx, np.full(P, 15.0), cz], -1).astype(np.float32)
    offs = np.array([[0.0, 0.0, 0.0], [0.35, 0.0, 0.1], [-0.1, 0.0, 0.35]],
                    np.float32)
    origin = origin0[:, None, :] + offs[None, :, :]
    tilt = rng.uniform(-0.08, 0.08, (P, 1, 3)).astype(np.float32)
    tilt[..., 1] = 0.0
    d = np.array([0.0, -1.0, 0.0], np.float32) + tilt
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    direction = np.broadcast_to(d, (P, R, 3)).astype(np.float32)
    gps = np.linspace(0.0, 0.01, P).astype(np.float32)
    return RayBundle(origin=origin, direction=np.ascontiguousarray(direction),
                     gps_time=gps)


# --------------------------------------------------------------------------
# scalar reference transcription
# --------------------------------------------------------------------------

def _noise_rows(buf):
    rows = buf.shape[0] // noise_mod.NUM_STREAMS
    return buf[:rows * noise_mod.NUM_STREAMS].reshape(
        rows, noise_mod.NUM_STREAMS), rows


def _moller(o, d, v0, v1, v2):
    """Scalar Möller–Trumbore; returns t or None."""
    e1, e2 = v1 - v0, v2 - v0
    h = np.cross(d, e2)
    a = float(np.dot(e1, h))
    if abs(a) < 1e-12:
        return None
    f = 1.0 / a
    s = o - v0
    u = f * float(np.dot(s, h))
    if u < 0.0 or u > 1.0:
        return None
    q = np.cross(s, e1)
    v = f * float(np.dot(d, q))
    if v < 0.0 or u + v > 1.0:
        return None
    t = f * float(np.dot(e2, q))
    return t if t > 1e-6 else None


def _refract(I, N, eta):  # noqa: E741 — GLSL naming
    cosi = float(np.dot(N, I))
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    if k < 0.0:
        return np.zeros(3)
    return eta * I - (eta * cosi + math.sqrt(k)) * N


def _hermite_lookup(tables, mat, x, y, t):
    """`getHermiteInterpolation` with non-negative mod (pipeline doc'd
    convention) — x wraps mod 360, y clamps to [0, 90]."""
    H = [[-t, 2.0 - t, t - 2.0, t],
         [2.0 * t, t - 3.0, 3.0 - 2.0 * t, -t],
         [-t, 0.0, t, 0.0],
         [0.0, 1.0, 0.0, 0.0]]
    xi = int(math.floor(x)) % 360
    yi = min(max(int(math.floor(y)), 0), 90)
    xf = x - math.floor(x)
    yf = y - math.floor(y)
    clamp = lambda v: min(max(v, 0), 90)
    rx = [float(tables[mat, (xi + k - 1) % 360, clamp(yi - 1)])
          for k in range(4)]
    ry = [float(tables[mat, (xi - 1) % 360, clamp(yi + k - 1)])
          for k in range(4)]

    def spline(r, f):
        c = [sum(H[j][i] * r[i] for i in range(4)) for j in range(4)]
        return ((c[0] * f + c[1]) * f + c[2]) * f + c[3]

    return spline(rx, xf) + spline(ry, yf)


def oracle_simulate(scene, rays, materials, noise_buf, scalars, cfg):
    """Scalar transcription of the full reference pipeline for one chunk."""
    V = np.asarray(scene.vertices, np.float64)
    F = np.asarray(scene.faces)
    FC = np.asarray(scene.face_comp)
    CM = np.asarray(scene.comp_material)
    CS = np.asarray(scene.comp_surface)
    KS = np.asarray(scene.vertex_ks, np.float64)
    NS = np.asarray(scene.vertex_ns, np.float64)
    RI = np.asarray(materials.refractive_index, np.float64)
    RO = np.asarray(materials.roughness, np.float64)
    TB = np.asarray(materials.brdf_table, np.float64)
    nz_rows, n_rows = _noise_rows(np.asarray(noise_buf, np.float64))
    s = {k: float(np.asarray(getattr(scalars, k)))
         for k in ("peak_power", "pulse_radius", "max_range", "loss_mult",
                   "loss_add", "loss_power", "loss_threshold",
                   "reflectance_weight", "sensor_diameter",
                   "system_attenuation", "atmospheric_attenuation",
                   "water_height", "outlier_threshold")}
    b0, b1 = [float(x) for x in np.asarray(scalars.max_range_boundary)]
    o_r0, o_r1 = [float(x) for x in np.asarray(scalars.outlier_range)]

    O = np.asarray(rays.origin, np.float64).copy()
    D = np.asarray(rays.direction, np.float64).copy()
    GPS = np.asarray(rays.gps_time, np.float64)
    P, R = O.shape[0], O.shape[1]
    Lmax = cfg.max_returns
    ray_power = s["peak_power"] / R

    start = O.copy()                               # startingPoint (fixed)
    prev_dir = D.copy()                            # previousDirection
    active = np.ones((P, R), bool)
    return_count = np.zeros(P, np.int64)
    prev_water = np.zeros(P, bool)
    prev_point = np.zeros((P, 3))

    rec = {k: np.zeros((Lmax, P) + sh) for k, sh in [
        ("mask", ()), ("point", (3,)), ("distance", ()), ("angle", ()),
        ("gps", ()), ("comp", ()), ("retnum", ()), ("nint", ()),
        ("winner", ()), ("pwater", ()), ("ppoint", (3,)), ("start", (3,)),
        ("dir", (3,)), ("normal", (3,))]}
    rec["mask"] = rec["mask"].astype(bool)
    out = {"mask": np.zeros((Lmax, P), bool), "point": np.zeros((Lmax, P, 3)),
           "dist": np.zeros((Lmax, P))}
    sensor_normal = (np.array([1.0, 0.0, 1.0])
                     if cfg.is_terrestrial else np.array([1.0, 1.0, 0.0]))

    def nearest(o, d):
        best_t, best_f = None, -1
        for fi in range(len(F)):
            t = _moller(o, d, V[F[fi, 0]], V[F[fi, 1]], V[F[fi, 2]])
            if t is not None and (best_t is None or t < best_t):
                best_t, best_f = t, fi
        return best_t, best_f

    for L in range(Lmax):
        for p in range(P):
            hits = [nearest(O[p, r], D[p, r]) if active[p, r]
                    else (None, -1) for r in range(R)]
            valid = [h[0] is not None for h in hits]
            if not any(valid):
                active[p, :] = False
                continue
            w = min((hits[r][0], r) for r in range(R) if valid[r])[1]
            t_w, f_w = hits[w]
            point_w = O[p, w] + D[p, w] * t_w
            tri = V[F[f_w]]
            n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
            normal_w = n / np.linalg.norm(n)
            comp_w = int(FC[f_w])
            mat_w = int(CM[comp_w])
            is_water = bool(CS[comp_w] & SURFACE_WATER)
            is_terrain = bool(CS[comp_w] & SURFACE_TERRAIN)

            # footprint merge (`reduceCollisions:201-223`)
            footprint = np.linalg.norm(point_w - start[p, w]) \
                * s["pulse_radius"]
            allowed = 2.0 * footprint * (
                2.0 - abs(float(np.dot(normal_w, -D[p, w]
                                       / np.linalg.norm(D[p, w])))))
            same = np.zeros(R, bool)
            for r in range(R):
                if not valid[r]:
                    continue
                pt_r = O[p, r] + D[p, r] * hits[r][0]
                contig = (int(FC[hits[r][1]]) == comp_w
                          and bool(set(F[hits[r][1]]) & set(F[f_w])))
                same[r] = (np.linalg.norm(pt_r - point_w) < allowed
                           or hits[r][1] == f_w or contig)
            num_int = int(same.sum())
            continue_ray = np.array(valid) & ~same

            # record fields (:225-233)
            corrected = float(np.linalg.norm(point_w - start[p, w]))
            nd = -D[p, w] / np.linalg.norm(D[p, w])
            ang = math.acos(min(max(float(np.dot(nd * sensor_normal, nd)),
                                    -1.0), 1.0))
            angle = min(max(ang, -PI / 2), PI / 2) / (PI / 2) * 90.0
            gps = float(GPS[p]) + corrected * 2.0 / LIGHT_SPEED

            # validate (`validateCollision:132-151`)
            idx_w = p * R + w                      # global winner-ray index
            nz = nz_rows[idx_w % n_rows]
            noisy_max = s["max_range"] \
                + nz[noise_mod.DISTANCE_STREAM] * (b1 - b0) + b0
            shin = min(max(KS[F[f_w, 0]] ** NS[F[f_w, 0]] * RO[mat_w],
                           0.0), 1.0)
            loss_thr = 0.0 if shin < s["loss_threshold"] else (
                s["loss_mult"] * max(shin + s["loss_add"], 0.0)
                ** s["loss_power"])
            lost = (nz[noise_mod.LOSS_STREAM] <= loss_thr
                    and not cfg.bathymetric)
            first = return_count[p] == 0
            valid_col = (corrected < noisy_max
                         and (not is_water or first) and not lost)

            # error displacement (:98-130)
            point_rec = point_w.copy()
            if cfg.include_shiny_surface_error:
                factor = 1.0 - shin
                comp_rand = nz_rows[comp_w % n_rows][
                    noise_mod.MODEL_COMP_STREAM] * SHINY_MODEL_WEIGHT
                pt_rand = nz[noise_mod.POINT_STREAM] * SHINY_INDIVIDUAL_ERROR
                point_rec = point_rec + D[p, w] * (
                    factor * factor * corrected * SHINY_DISTANCE_WEIGHT) \
                    + D[p, w] * ((comp_rand + pt_rand) * factor)
            if cfg.include_terrain_induced_error and is_terrain and valid_col:
                height = start[p, w, 1] - point_rec[1]
                v_err = nz[noise_mod.TERRAIN_V_STREAM] * (
                    VERTICAL_TERRAIN_ERROR_HEIGHT_W * height
                    + VERTICAL_TERRAIN_ERROR_ANGLE_W * angle)
                h_err = nz[noise_mod.TERRAIN_H_STREAM] \
                    * HORIZONTAL_TERRAIN_ERROR_W * height
                h_axis = np.array([nz[noise_mod.AXIS_X_STREAM], 0.0,
                                   nz[noise_mod.AXIS_Z_STREAM]])
                point_rec = point_rec + np.array([0.0, 1.0, 0.0]) * v_err \
                    + h_axis * h_err

            if valid_col:
                rec["mask"][L, p] = True
                rec["point"][L, p] = point_rec
                rec["distance"][L, p] = corrected
                rec["angle"][L, p] = angle
                rec["gps"][L, p] = gps
                rec["comp"][L, p] = comp_w
                rec["retnum"][L, p] = return_count[p]
                rec["nint"][L, p] = num_int
                rec["winner"][L, p] = w
                rec["pwater"][L, p] = prev_water[p]
                rec["ppoint"][L, p] = prev_point[p]
                rec["start"][L, p] = start[p, w]
                rec["dir"][L, p] = D[p, w]
                rec["normal"][L, p] = normal_w

            # outlier (`addOutlier:29-64`; level-decorrelated rows)
            if cfg.include_outliers and valid_col:
                onz = nz_rows[(p + L * OUTLIER_LEVEL_STRIDE) % n_rows]
                if onz[noise_mod.OUTLIER_STREAM] * 2.0 - 1.0 \
                        > s["outlier_threshold"]:
                    o_dn = onz[noise_mod.OUTLIER_DISTANCE_STREAM] * 1.5
                    o_d = (o_dn * (o_r1 - o_r0) + o_r0) * corrected
                    exceed = (return_count[p] + 1) >= Lmax
                    cont = (not exceed) and is_water and cfg.bathymetric
                    pd = D[p, w] if cont else prev_dir[p, w]
                    pd = pd / np.linalg.norm(pd)
                    out["mask"][L, p] = True
                    out["point"][L, p] = start[p, w] + pd * o_d
                    out["dist"][L, p] = o_d

            # bounce state (`validateCollision:152-170`)
            exceed = (return_count[p] + 1) >= Lmax
            if valid_col:
                for r in range(R):
                    revive = valid[r] and is_water and cfg.bathymetric
                    if not exceed and (continue_ray[r] or revive):
                        if is_water:
                            pt_r = O[p, r] + D[p, r] * hits[r][0] \
                                if valid[r] else O[p, r]
                            O[p, r] = pt_r + D[p, r] * 1e-4
                            N_or = normal_w if np.dot(
                                normal_w, D[p, r]) < 0 else -normal_w
                            refr = _refract(D[p, r], N_or, RI[mat_w])
                            prev_dir[p, r] = D[p, r]
                            nrm = np.linalg.norm(refr)
                            D[p, r] = refr / nrm if nrm > 0 else refr
                        else:
                            prev_dir[p, r] = D[p, r]
                        active[p, r] = True
                    else:
                        active[p, r] = False
                return_count[p] += 1
                prev_water[p] = is_water
                prev_point[p] = point_rec
            else:
                active[p, :] = continue_ray

    # shading (`computeColor` + `computeIntensity`, post-loop rayData)
    intensity = np.zeros((Lmax, P))
    for L in range(Lmax):
        for p in range(P):
            if not rec["mask"][L, p]:
                continue
            w = int(rec["winner"][L, p])
            final_o = O[p, w]
            pt = rec["point"][L, p]
            Lv = final_o - pt
            Lv = Lv / np.linalg.norm(Lv)
            comp_w = int(rec["comp"][L, p])
            mat_w = int(CM[comp_w])
            N_v = rec["normal"][L, p]              # winner face normal
            y = min(max(abs(float(np.dot(Lv, N_v))), 0.0), 1.0) \
                * (PI / 2.0) * (180.0 / PI)
            x = (math.atan2(Lv[2], Lv[0]) + PI / 2.0) * 2.0 * (180.0 / PI)
            x = x % 360.0
            brdf = min(max(_hermite_lookup(TB, mat_w, x, y, cfg.hermite_t),
                           0.0), 1.0)
            d = rec["distance"][L, p]
            atm = 10.0 ** (-2.0 * d * s["atmospheric_attenuation"] / 1.0e4)
            if cfg.bathymetric and rec["pwater"][L, p]:
                # `computeBathymetricIntensity`
                area = PI * (s["sensor_diameter"] / 2.0) ** 2
                altitude = rec["start"][L, p, 1] - s["water_height"]
                depth = s["water_height"] - pt[1]
                tdir = rec["ppoint"][L, p] - rec["start"][L, p]
                tdir = tdir / np.linalg.norm(tdir)
                tcos = -tdir[1]
                denom = WATER_REFRACTIVE * altitude + depth
                wang = math.acos(min(max(-rec["dir"][L, p, 1], -1.0), 1.0))
                hyp = depth / math.cos(wang)
                sinus = math.sin(wang) * hyp
                inten = (ray_power * brdf * area * tcos * tcos
                         * s["reflectance_weight"] * atm * 100.0) \
                    / (PI * denom * denom)
                inten *= math.exp(-2.0 * WATER_DIFFUSE_MAX * depth
                                  * hyp / sinus)
            else:
                inten = (ray_power * rec["nint"][L, p]
                         * s["sensor_diameter"] ** 2 * brdf
                         * s["reflectance_weight"] * atm
                         * s["system_attenuation"]) / (4.0 * d * d)
            intensity[L, p] = inten
    rec["intensity"] = intensity
    rec["num_returns"] = return_count
    return rec, out


# --------------------------------------------------------------------------
# the assertion
# --------------------------------------------------------------------------

def _run_pipeline(scene, rays, materials, noise_buf, scalars, cfg):
    bvh = build_scene_bvh(scene)
    fn = jax.jit(functools.partial(simulate_chunk, cfg=cfg,
                                   scene_has_water=True))
    return fn(scene, bvh, materials, rays, noise_buf, scalars)


def test_parity_composed_pipeline():
    """Positions / intensities / return structure / outliers must match the
    scalar transcription of the reference kernels."""
    scene = parity_scene()
    rays = parity_rays()
    # Aerial: bathymetric green-wavelength scanning is an ALS mode in the
    # reference, and the aerial sensor normal (1,1,0) keeps the scan angle
    # of near-vertical rays small (the TLS normal (1,0,1) would rate them
    # ~90 deg and blow the terrain error up to tens of meters).
    cfg = SensorConfig(
        lidar_type=LiDARType.AERIAL_LINEAR,
        rays_per_pulse=3, max_returns=3, max_range=60.0,
        pulse_radius=0.001, bathymetric=True, water_height=0.5,
        include_outliers=True, outlier_threshold=0.2,
        outlier_range=(0.1, 0.8),
        include_shiny_surface_error=True,
        include_terrain_induced_error=True,
        shading_mode=ShadingMode.MEASURED,
        brdf_interpolation=BRDFInterpolation.HERMITE)
    materials = MaterialLibrary.default().table_at(532)
    min_y = float(np.asarray(scene.vertices)[:, 1].min())
    scalars = SimScalars.from_config(cfg, min_y)
    noise_buf = noise_mod.make_sim_noise(jax.random.PRNGKey(0))

    cloud = _run_pipeline(scene, rays, materials, noise_buf, scalars, cfg)

    # oracle needs the winner-face normal during shading: run with a stash
    rec, out = oracle_simulate(scene, rays, materials,
                               np.asarray(noise_buf), scalars, cfg)

    L, P = cfg.max_returns, rays.num_pulses
    K = L * P
    mask = np.asarray(cloud.mask)
    assert mask.shape[0] == 2 * K                  # records + outlier block

    # ---- return structure ----
    o_mask = rec["mask"].reshape(K)
    np.testing.assert_array_equal(mask[:K], o_mask)
    assert o_mask.sum() > P * 0.8, "scene should produce many returns"
    assert (rec["mask"][1].sum()) > 3, "need multi-return pulses"
    assert rec["pwater"].any(), "need bathymetric returns"
    np.testing.assert_array_equal(
        np.asarray(cloud.return_number)[:K][o_mask],
        rec["retnum"].reshape(K)[o_mask])
    np.testing.assert_array_equal(
        np.asarray(cloud.num_returns)[:K].reshape(L, P)[0],
        rec["num_returns"])
    np.testing.assert_array_equal(
        np.asarray(cloud.comp_id)[:K][o_mask],
        rec["comp"].reshape(K)[o_mask])

    # ---- positions / distances / angles / gps ----
    # atol 1mm: the terrain error feeds on acos() evaluated ~1e-5 from its
    # argument bound, where f32 vs f64 rounding legitimately moves the
    # displacement by a few 1e-4 m
    np.testing.assert_allclose(
        np.asarray(cloud.position)[:K][o_mask],
        rec["point"].reshape(K, 3)[o_mask], rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(cloud.distance)[:K][o_mask],
        rec["distance"].reshape(K)[o_mask], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cloud.scan_angle_rank)[:K][o_mask],
        rec["angle"].reshape(K)[o_mask], rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(cloud.gps_time)[:K][o_mask],
        rec["gps"].reshape(K)[o_mask], rtol=1e-5, atol=1e-7)

    # ---- intensities (radar equation + bathymetric + Hermite BRDF) ----
    # rtol 1%: the bathymetric exponential decay amplifies f32-vs-f64
    # argument rounding; semantic drift (wrong formula / merge / noise
    # stream) moves intensities by orders of magnitude, not percents
    np.testing.assert_allclose(
        np.asarray(cloud.intensity)[:K][o_mask],
        rec["intensity"].reshape(K)[o_mask], rtol=1e-2, atol=1e-9)

    # ---- outliers ----
    np.testing.assert_array_equal(mask[K:], out["mask"].reshape(K))
    assert out["mask"].sum() > 10
    om = out["mask"].reshape(K)
    np.testing.assert_allclose(
        np.asarray(cloud.position)[K:][om],
        out["point"].reshape(K, 3)[om], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cloud.distance)[K:][om],
        out["dist"].reshape(K)[om], rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# the same oracle driven by REAL ray-builder geometry (VERDICT r02 item 6):
# TLS spherical, ALS zigzag and ALS elliptical pulses from sensors/, not a
# synthetic grid, including a green-wavelength bathymetric zigzag case.
# --------------------------------------------------------------------------

def _builder_cfg(kind):
    common = dict(rays_per_pulse=3, max_returns=3, max_range=60.0,
                  pulse_radius=0.002, bathymetric=True, water_height=0.5,
                  include_outliers=True, outlier_threshold=0.2,
                  outlier_range=(0.1, 0.8),
                  include_shiny_surface_error=True,
                  include_terrain_induced_error=False,
                  shading_mode=ShadingMode.MEASURED,
                  brdf_interpolation=BRDFInterpolation.HERMITE)
    if kind == "tls_spherical":
        # downward-looking spherical scan so scan angles stay moderate
        return SensorConfig(
            lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
            tls_position=(0.0, 14.0, 0.0),
            tls_fov_horizontal=360.0, tls_fov_vertical=60.0,
            tls_middle_angle_vertical=-55.0,
            tls_resolution_horizontal=24, tls_resolution_vertical=8,
            **common)
    lidar_type = (LiDARType.AERIAL_ZIGZAG if kind == "als_zigzag"
                  else LiDARType.AERIAL_ELLIPTICAL)
    return SensorConfig(
        lidar_type=lidar_type,
        als_position=(0.0, 25.0, 0.0),
        als_fov_horizontal=45.0, als_fov_vertical=7.0,
        als_scan_frequency=20, als_pulse_frequency=640,
        als_speed=25.0, als_overlapping=0.1, **common)


@pytest.mark.parametrize(
    "kind", ["tls_spherical", "als_zigzag", "als_elliptical"])
def test_parity_builder_geometry(kind):
    """Pipeline vs oracle on pulses from the actual ray builders (TLS
    spherical / ALS zigzag / ALS elliptical), bathymetric mode at 532nm.
    The oracle never sees the builders' internals — only the emitted
    RayBundle — so this closes the loop builder -> pipeline -> physics."""
    from lidar_brdf_tpu.api import build_rays
    scene = parity_scene()
    cfg = _builder_cfg(kind)
    with jax.default_device(jax.devices("cpu")[0]):
        rays = build_rays(cfg, scene)
    # deterministic subsample to keep the scalar oracle fast; the slice IS
    # the chunk both sides see, so noise-stream indexing stays aligned
    P = min(96, rays.num_pulses)
    stride = max(rays.num_pulses // P, 1)
    rays = jax.tree.map(
        lambda a: np.ascontiguousarray(np.asarray(a)[:P * stride:stride]),
        rays)
    materials = MaterialLibrary.default().table_at(532)
    min_y = float(np.asarray(scene.vertices)[:, 1].min())
    scalars = SimScalars.from_config(cfg, min_y)
    noise_buf = noise_mod.make_sim_noise(jax.random.PRNGKey(0))

    cloud = _run_pipeline(scene, rays, materials, noise_buf, scalars, cfg)
    rec, out = oracle_simulate(scene, rays, materials,
                               np.asarray(noise_buf), scalars, cfg)

    L, P = cfg.max_returns, rays.num_pulses
    K = L * P
    mask = np.asarray(cloud.mask)
    o_mask = rec["mask"].reshape(K)
    np.testing.assert_array_equal(mask[:K], o_mask)
    assert o_mask.sum() > P * 0.5, f"{kind}: too few returns to be a test"
    np.testing.assert_array_equal(
        np.asarray(cloud.return_number)[:K][o_mask],
        rec["retnum"].reshape(K)[o_mask])
    np.testing.assert_array_equal(
        np.asarray(cloud.comp_id)[:K][o_mask],
        rec["comp"].reshape(K)[o_mask])
    # atol 5mm (vs 1mm in the composed test): builder rays cross the water
    # interface OBLIQUELY, and the refracted-leg geometry amplifies f32 vs
    # f64 rounding of the refraction direction over ~25m of path; semantic
    # drift moves points by centimeters-to-meters, not millimeters
    np.testing.assert_allclose(
        np.asarray(cloud.position)[:K][o_mask],
        rec["point"].reshape(K, 3)[o_mask], rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(cloud.distance)[:K][o_mask],
        rec["distance"].reshape(K)[o_mask], rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(cloud.intensity)[:K][o_mask],
        rec["intensity"].reshape(K)[o_mask], rtol=1e-2, atol=1e-9)
    np.testing.assert_array_equal(mask[K:], out["mask"].reshape(K))
    if kind == "als_zigzag":
        assert rec["pwater"].any(), \
            "zigzag flight must produce bathymetric (through-water) returns"
