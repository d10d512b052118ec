"""lidar_brdf_tpu — TPU-native differentiable LiDAR simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AlfonsoLRz/LiDAR_BRDF (Lopez et al., ISPRS 2025): BVH-accelerated
ray-triangle intersection, BRDF-based reflectance (analytic + measured
tables), beam-footprint supersampling, multi-return extraction, TLS/ALS scan
patterns, and LAS-style point-cloud synthesis — as a pure functional,
end-to-end differentiable library that shards rays across TPU meshes.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    BRDFInterpolation,
    BRDFModel,
    LiDARType,
    SensorConfig,
    ShadingMode,
    get_preset,
)
from .core.types import (  # noqa: F401
    BVH,
    Hit,
    MaterialTable,
    PointCloud,
    RayBundle,
    TriangleScene,
)
