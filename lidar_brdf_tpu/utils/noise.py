"""Deterministic noise buffers.

The reference fills a 5e6-float U[0,1] SSBO from a wall-clock-seeded mt19937
(`LiDARSimulation::buildWhiteNoiseTexture`, LiDARSimulation.cpp:113-125;
`RandomUtilities.h:78-84`) and every kernel samples it as
``noise[(index + OFFSET) % size]`` with per-purpose constant offsets
(e.g. `reduceCollisions-comp.glsl:20-26`).

We keep the same *structure* — one shared buffer, constant stream offsets, a
modular gather — but fill it with counter-based `jax.random` bits so runs are
reproducible from a single seed (SURVEY.md §4 determinism requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream offsets, named after their reference uses.
DISTANCE_NOISE_OFFSET = 0x456823       # noisy max-range cut
LOSS_NOISE_OFFSET = 0x45632            # per-return loss probability
MODEL_COMP_NOISE_OFFSET = 0xAC987      # shiny error, per component
POINT_NOISE_OFFSET = 0xAC666           # shiny error, per point
TERRAIN_NOISE_OFFSET_V = 0x56789       # terrain vertical error
TERRAIN_NOISE_OFFSET_H = 0x65432       # terrain horizontal error
HORIZONTAL_AXIS_OFFSET_X = 0x45623     # terrain horizontal axis
HORIZONTAL_AXIS_OFFSET_Z = 0x7652FA
OUTLIER_NOISE_OFFSET = 0x234578        # addOutlier probability
OUTLIER_DISTANCE_OFFSET = 0xFCBA23     # addOutlier parametric distance
# Ray-builder offsets (`terrestrialSpherical-comp.glsl:6-8` etc.)
AXIS_NOISE_OFFSET = (0xFF245, 0x23456, 0xFFFF28)
ANGLE_NOISE_OFFSET = 0xAC987
PULSE_NOISE_OFFSET = (0x66565, 0x23456)
RAY_NOISE_OFFSET = (0xFF245, 0x23456, 0xFFFF289)
HEIGHT_NOISE_OFFSET = 0xAC987

SIM_NOISE_SIZE = 5_000_000     # U[0,1]  (`LiDARSimulation.cpp:23`)
RAYGEN_NOISE_SIZE = 500_000    # U[-1,1] (`RayBuilder.cpp:11`)


def make_sim_noise(key: jax.Array, size: int = SIM_NOISE_SIZE) -> jax.Array:
    """U[0,1] buffer used by reduce/validate/outlier stages."""
    return jax.random.uniform(key, (size,), jnp.float32)


def make_raygen_noise(key: jax.Array, size: int = RAYGEN_NOISE_SIZE) -> jax.Array:
    """U[-1,1] buffer used by the ray builders."""
    return jax.random.uniform(key, (size,), jnp.float32, minval=-1.0, maxval=1.0)


def sample(buffer: jax.Array, index, offset) -> jax.Array:
    """``noise[(index + offset) % size]`` — the reference access pattern."""
    size = buffer.shape[0]
    idx = (index.astype(jnp.uint32) + jnp.uint32(offset)) % jnp.uint32(size)
    return buffer[idx]


# ---------------------------------------------------------------------------
# Interleaved sim-noise streams.
#
# The reference separates noise "purposes" by adding large offsets into one
# flat buffer (`reduceCollisions-comp.glsl` uses distinct bases per use).
# Separate offsets mean separate gathers, and TPU gathers cost ~10 ns per
# gathered *slice* regardless of its width — so we lay the purposes out as
# columns instead: stream k for index i lives at row (i % rows), column k.
# All streams of one index are then a single row-gather.
# ---------------------------------------------------------------------------

NUM_STREAMS = 16
DISTANCE_STREAM = 0        # noisy max-range cut
LOSS_STREAM = 1            # per-return loss probability
POINT_STREAM = 2           # shiny error, per point
TERRAIN_V_STREAM = 3       # terrain vertical error
TERRAIN_H_STREAM = 4       # terrain horizontal error
AXIS_X_STREAM = 5          # terrain horizontal axis x
AXIS_Z_STREAM = 6          # terrain horizontal axis z
OUTLIER_STREAM = 7         # addOutlier probability
OUTLIER_DISTANCE_STREAM = 8
MODEL_COMP_STREAM = 9      # shiny error, per component


def stream_rows(buffer: jax.Array, index) -> jax.Array:
    """(index.shape, NUM_STREAMS) — all noise streams for each index in one
    row gather."""
    rows = buffer.shape[0] // NUM_STREAMS
    view = buffer[:rows * NUM_STREAMS].reshape(rows, NUM_STREAMS)
    return view[index.astype(jnp.uint32) % jnp.uint32(rows)]


def stream_sample(buffer: jax.Array, index, stream: int) -> jax.Array:
    """Single-stream read with the same layout as `stream_rows`."""
    rows = buffer.shape[0] // NUM_STREAMS
    view = buffer[:rows * NUM_STREAMS].reshape(rows, NUM_STREAMS)
    return view[index.astype(jnp.uint32) % jnp.uint32(rows), stream]
