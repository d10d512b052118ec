"""Declarative simulation configuration.

Replaces the reference's GUI-mutated static parameter structs
(`LiDARParameters.h:15-481`, `PointCloudParameters.h:13-36`) with one frozen
dataclass consumed as *static* (non-traced) configuration by the jitted
pipeline.  Sensor hardware presets mirror
`LiDARParameters::buildSpecifications()` (`LiDARParameters.h:335-481`).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import math
from dataclasses import dataclass, field, replace


class LiDARType(enum.IntEnum):
    """Ray-builder selector (reference `LiDARParameters::RayBuild`)."""

    TERRESTRIAL_SPHERICAL = 0
    AERIAL_LINEAR = 1
    AERIAL_ZIGZAG = 2
    AERIAL_ELLIPTICAL = 3


class BRDFModel(enum.IntEnum):
    """Analytic BRDF selector (`reflectIrradiance-comp.glsl:1-8`)."""

    IDEAL_SPECULAR = 0
    IDEAL_DIFFUSE = 1
    MINNAERT = 2
    BLINN_PHONG = 3
    COOK_TORRANCE = 4
    WARD_ANISOTROPIC = 5
    OREN_NAYAR = 6
    ZOHDI = 7


class BRDFInterpolation(enum.IntEnum):
    """Measured-table lookup mode (`computeColor-comp.glsl:32-70`)."""

    RAW = 0
    BILINEAR = 1
    HERMITE = 2


class ShadingMode(enum.IntEnum):
    """Which reflectance path feeds the radar equation.

    MEASURED = Hermite lookup in the 360x91 tables (current reference path,
    `computeColor-comp.glsl:84-100`); ANALYTIC = the paper's parametric BRDF
    mode (`reflectIrradiance-comp.glsl`, selected per material by
    `Assets/LiDAR/BRDFModel/BRDFModel.txt`); LAMBERTIAN = plain cosine
    (useful as the minimal differentiable baseline).
    """

    MEASURED = 0
    ANALYTIC = 1
    LAMBERTIAN = 2


class ASPRSClass(enum.IntEnum):
    """ASPRS LAS classes (`LiDARParameters.h:124-143`)."""

    CREATED = 0
    UNCLASSIFIED = 1
    GROUND = 2
    LOW_VEGETATION = 3
    MEDIUM_VEGETATION = 4
    HIGH_VEGETATION = 5
    BUILDING = 6
    NOISE = 7
    RESERVED_01 = 8
    WATER = 9
    RAIL = 10
    ROAD_SURFACE = 11
    RESERVED_02 = 12
    WIRE_GUARD = 13
    WIRE_CONDUCTOR = 14
    TRANSMISSION_TOWER = 15
    WIRE = 16
    BRIDGE_DECK = 17
    NIGH_NOISE = 18


MAX_NUMBER_OF_RETURNS = 5          # `LiDARParameters.h:34`
LIGHT_SPEED_MS = 299792458.0       # `LiDARParameters.h:147`

# Atmospheric attenuation interpolation constants
# (`LiDARSimulation::getAtmosphericAttenuation`, LiDARSimulation.cpp:144-159)
TLS_MIN_ATMOSPHERE_ATTENUATION = 0.2
TLS_MAX_ATMOSPHERE_ATTENUATION = 3.9
ALS_MIN_ATMOSPHERE_ATTENUATION = 0.14
ALS_MAX_ATMOSPHERE_ATTENUATION = 0.22


@dataclass(frozen=True)
class RangeResolution:
    """Non-uniform TLS vertical band (`LiDARParameters.h:18-27`)."""

    angle_min_deg: float
    angle_max_deg: float
    resolution: int


def _default_return_thresholds() -> tuple[float, ...]:
    # `LiDARParameters` ctor: 1 - 0.02 - 0.05 * returnIdx
    return tuple(1.0 - 0.02 - 0.05 * i for i in range(MAX_NUMBER_OF_RETURNS))


@dataclass(frozen=True)
class SensorConfig:
    """All sensor / simulation knobs (static pytree-free config).

    Field-by-field parity with `LiDARParameters.h:150-333`; defaults follow
    the reference constructor (`LiDARParameters.h:228-316`).
    """

    lidar_type: LiDARType = LiDARType.TERRESTRIAL_SPHERICAL
    preset: str = "custom"

    # Global
    # REFERENCE-DEAD parity field: the reference's per-channel origin
    # offset is hard-coded to zero for EVERY channel in the release
    # (`TerrestrialSphericalBuilder::getSensorPosition` pushes vec3(0)
    # unconditionally, TerrestrialSphericalBuilder.cpp:157-166), so
    # `channels` only scales the preset tables' nominal channel count and
    # never moves a ray.  Kept so presets round-trip; intentionally unread
    # by the pipeline, like the reference.
    channels: int = 16
    max_range: float = 200.0
    max_range_soft_boundary: tuple[float, float] = (-10.0, 3.0)
    max_returns: int = 1
    peak_power: float = 65.0                 # watts
    pulse_radius: float = 0.001
    rays_per_pulse: int = 10
    reflectance_weight: float = 1.0
    # REFERENCE-DEAD parity field: the reference uploads this per-return
    # threshold SSBO (`LiDARSimulation.cpp:403-409`) but NO shader reads
    # it — return loss is governed by the shininess loss model instead
    # (`getLossThreshold`, reduceCollisions-comp.glsl:91-96).  Kept so
    # configs round-trip; intentionally unread by the pipeline, like the
    # reference.
    return_thresholds: tuple[float, ...] = field(default_factory=_default_return_thresholds)
    sensor_diameter: float = 0.215           # meters
    system_attenuation: float = 1.0
    wavelength_nm: tuple[int, int] = (1064, 1064)
    scan_frequency_hz: float = 50.0
    simulation_time: float = 1.0
    use_simulation_time: bool = False

    # Noise / error models
    include_outliers: bool = False
    outlier_range: tuple[float, float] = (0.0, 1.0)
    outlier_threshold: float = 0.8
    include_shiny_surface_error: bool = True
    include_terrain_induced_error: bool = False
    bathymetric: bool = False
    water_height: float = 0.0

    # Loss function (`LiDARParameters` _multCoefficient etc.)
    loss_mult_coefficient: float = 5.0
    loss_add_coefficient: float = -0.4
    loss_threshold: float = 0.5              # _zeroThreshold
    loss_power: float = 4.815

    # Measured-BRDF interpolation
    hermite_t: float = 0.5
    brdf_interpolation: BRDFInterpolation = BRDFInterpolation.HERMITE
    shading_mode: ShadingMode = ShadingMode.MEASURED

    # TLS
    tls_position: tuple[float, float, float] = (-1.2, 1.5, 1.5)
    tls_direction: tuple[float, float, float] = (0.0, 0.0, 0.0)
    tls_fov_horizontal: float = 240.0        # degrees
    tls_fov_vertical: float = 150.0
    tls_resolution_horizontal: int = 360
    tls_resolution_vertical: int = 64
    tls_middle_angle_horizontal: float = 0.0
    tls_middle_angle_vertical: float = 0.0
    # REFERENCE-DEAD parity field: the reference declares axis jittering
    # but the uniform upload is commented out in the release
    # (`TerrestrialSphericalBuilder.cpp:99`), so the shader's jitter axis
    # rotation always sees 0.  Kept so configs round-trip; intentionally
    # unread by the pipeline, like the reference.  Angle jittering
    # (`tls_angle_jittering`) IS live, matching the reference.
    tls_axis_jittering: float = 1e-4
    tls_angle_jittering: float = 1e-4
    tls_atmospheric_clearness: float = 1.0
    tls_uniform_vertical_resolution: bool = True
    tls_range_resolution: tuple[RangeResolution, ...] = ()

    # ALS
    als_position: tuple[float, float, float] = (0.0, 30.0, 0.0)
    als_fov_horizontal: float = 70.0
    als_fov_vertical: float = 4.5
    als_speed: float = 0.089                 # m/s
    als_scan_frequency: int = 4
    als_pulse_frequency: int = 1000
    als_height_jittering: float = 1.0 / 200.0
    als_ray_jittering: float = 1.0 / 300.0
    als_max_scene_sweeps: int = 200
    als_overlapping: float = 0.5
    als_elliptical_scale: float = 0.5
    use_catmull_rom: bool = True
    douglas_peucker_epsilon: float = 3.0
    # user-drawn flight path: 2-D canvas points mapped onto the scene AABB
    # (`LiDARParameters::_alsManualPath/_alsManualPathCanvasSize`,
    # `RayBuilder::getAirbonePaths` manual branch, RayBuilder.cpp:146-213)
    als_manual_path: tuple[tuple[float, float], ...] | None = None
    als_manual_canvas_size: tuple[float, float] = (1.0, 1.0)

    # Runtime
    seed: int = 0
    chunk_pulses: int = 65536                # pulses per device dispatch

    def atmospheric_attenuation(self, scene_min_y: float = 0.0) -> float:
        """Reference `LiDARSimulation::getAtmosphericAttenuation`."""
        if self.lidar_type == LiDARType.TERRESTRIAL_SPHERICAL:
            return (self.tls_atmospheric_clearness
                    * (TLS_MAX_ATMOSPHERE_ATTENUATION - TLS_MIN_ATMOSPHERE_ATTENUATION)
                    + TLS_MIN_ATMOSPHERE_ATTENUATION)
        flying_height = self.als_position[1] - scene_min_y
        reference_height = 1000.0
        new_att = ALS_MAX_ATMOSPHERE_ATTENUATION * flying_height / reference_height
        return ALS_MAX_ATMOSPHERE_ATTENUATION + abs(ALS_MAX_ATMOSPHERE_ATTENUATION - new_att)

    @property
    def is_terrestrial(self) -> bool:
        return self.lidar_type == LiDARType.TERRESTRIAL_SPHERICAL

    def with_(self, **kw) -> "SensorConfig":
        return replace(self, **kw)

    def to_json(self) -> str:
        def enc(v):
            if isinstance(v, enum.IntEnum):
                return int(v)
            if isinstance(v, tuple):
                return [enc(x) for x in v]
            if dataclasses.is_dataclass(v):
                return dataclasses.asdict(v)
            return v
        return json.dumps({f.name: enc(getattr(self, f.name))
                           for f in dataclasses.fields(self)}, indent=2)

    @staticmethod
    def from_json(text: str) -> "SensorConfig":
        raw = json.loads(text)
        kw = {}
        for f in dataclasses.fields(SensorConfig):
            if f.name not in raw:
                continue
            v = raw[f.name]
            if f.name == "tls_range_resolution":
                v = tuple(RangeResolution(**r) if isinstance(r, dict)
                          else RangeResolution(*r) for r in v)
            elif f.name == "als_manual_path" and v is not None:
                v = tuple(tuple(p) for p in v)   # hashable (jit static arg)
            elif isinstance(v, list):
                v = tuple(v)
            kw[f.name] = v
        return SensorConfig(**kw)


# ---------------------------------------------------------------------------
# Hardware presets — parity with LiDARParameters::buildSpecifications()
# (`LiDARParameters.h:335-481`).  Values are published sensor spec sheets.
# ---------------------------------------------------------------------------

def _tls(**kw) -> SensorConfig:
    return SensorConfig(lidar_type=LiDARType.TERRESTRIAL_SPHERICAL, **kw)


SENSOR_PRESETS: dict[str, SensorConfig] = {
    "hdl64e": _tls(
        preset="hdl64e", channels=64, max_range=120.0, peak_power=60.0,
        sensor_diameter=0.215, tls_fov_horizontal=360.0, tls_fov_vertical=26.9,
        tls_middle_angle_vertical=-11.45, tls_resolution_horizontal=4500,
        tls_resolution_vertical=64, max_returns=2, scan_frequency_hz=10,
        tls_angle_jittering=0.002),
    "pandar64": _tls(
        preset="pandar64", channels=1, max_range=200.0, peak_power=60.0,
        sensor_diameter=0.116, tls_fov_horizontal=360.0, tls_fov_vertical=40.0,
        tls_middle_angle_vertical=-5.0, tls_resolution_horizontal=1800,
        tls_resolution_vertical=63, max_returns=2, scan_frequency_hz=10,
        tls_uniform_vertical_resolution=False,
        tls_range_resolution=(
            RangeResolution(-25.0, -19.0, 1), RangeResolution(-19.0, -14.0, 1),
            RangeResolution(-14.0, -6.0, 8), RangeResolution(-6.0, 2.0, 48),
            RangeResolution(2.0, 3.0, 1), RangeResolution(3.0, 5.0, 1),
            RangeResolution(5.0, 11.0, 2), RangeResolution(11.0, 15.0, 1))),
    "hdl32e": _tls(
        preset="hdl32e", channels=32, max_range=100.0, peak_power=12.0,
        sensor_diameter=0.085, tls_fov_horizontal=360.0, tls_fov_vertical=41.34,
        tls_middle_angle_vertical=-9.92, tls_resolution_horizontal=3600,
        tls_resolution_vertical=31, max_returns=2, scan_frequency_hz=10),
    "puck": _tls(
        preset="puck", channels=16, max_range=100.0, peak_power=8.0,
        sensor_diameter=0.103, tls_fov_horizontal=360.0, tls_fov_vertical=30.0,
        tls_middle_angle_vertical=0.0, tls_resolution_horizontal=3600,
        tls_resolution_vertical=15, max_returns=2, scan_frequency_hz=20),
    "puck_lite": _tls(
        preset="puck_lite", channels=16, max_range=100.0, peak_power=8.0,
        sensor_diameter=0.103, tls_fov_horizontal=360.0, tls_fov_vertical=30.0,
        tls_middle_angle_vertical=0.0, tls_resolution_horizontal=3600,
        tls_resolution_vertical=15, max_returns=2, scan_frequency_hz=20),
    "puck_hires": _tls(
        preset="puck_hires", channels=16, max_range=100.0, peak_power=8.0,
        sensor_diameter=0.103, tls_fov_horizontal=360.0, tls_fov_vertical=20.0,
        tls_middle_angle_vertical=0.0, tls_resolution_horizontal=3600,
        tls_resolution_vertical=15, max_returns=2, scan_frequency_hz=10),
    "ultra_puck": _tls(
        preset="ultra_puck", channels=32, max_range=200.0, peak_power=10.0,
        sensor_diameter=0.103, tls_fov_horizontal=360.0, tls_fov_vertical=40.0,
        tls_middle_angle_vertical=0.0, tls_resolution_horizontal=3600,
        tls_resolution_vertical=122, max_returns=2, scan_frequency_hz=20),
    "alpha_prime": _tls(
        preset="alpha_prime", channels=128, max_range=300.0, peak_power=22.0,
        sensor_diameter=0.1655, tls_fov_horizontal=360.0, tls_fov_vertical=40.0,
        tls_middle_angle_vertical=-5.0, tls_resolution_horizontal=3600,
        tls_resolution_vertical=364, max_returns=2, scan_frequency_hz=20),
    "zenmuse_l1": SensorConfig(
        preset="zenmuse_l1", lidar_type=LiDARType.AERIAL_ZIGZAG, channels=1,
        als_fov_horizontal=70.4, als_fov_vertical=4.5, als_scan_frequency=10,
        als_pulse_frequency=4900, max_returns=3),
}


def get_preset(name: str) -> SensorConfig:
    key = name.lower().replace("-", "_").replace(" ", "_")
    if key not in SENSOR_PRESETS:
        raise KeyError(f"unknown sensor preset {name!r}; "
                       f"available: {sorted(SENSOR_PRESETS)}")
    return SENSOR_PRESETS[key]


def tls_vertical_angles(cfg: SensorConfig) -> list[float]:
    """Per-row vertical angles in radians.

    Reference: `TerrestrialSphericalBuilder::precalculateVerticalAngles`
    (TerrestrialSphericalBuilder.cpp:186-212) including the uniform grid and
    the non-uniform per-band mode (Pandar64).
    """
    fov_v = math.radians(cfg.tls_fov_vertical)
    vres = tls_vertical_resolution(cfg)
    fov_v += fov_v / vres
    inc_v = fov_v / vres
    start = math.radians(cfg.tls_middle_angle_vertical) - fov_v / 2.0
    if cfg.tls_uniform_vertical_resolution:
        return [start + inc_v * i for i in range(vres)]
    angles = []
    angle = start
    for band in cfg.tls_range_resolution:
        inc = math.radians((band.angle_max_deg - band.angle_min_deg) / band.resolution)
        for _ in range(band.resolution):
            angles.append(angle)
            angle += inc
    return angles


def tls_vertical_resolution(cfg: SensorConfig) -> int:
    """Reference `TerrestrialSphericalBuilder::getVerticalResolution`."""
    if cfg.tls_uniform_vertical_resolution:
        return cfg.tls_resolution_vertical
    return sum(b.resolution for b in cfg.tls_range_resolution)
