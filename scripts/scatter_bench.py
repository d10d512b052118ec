"""Microbenchmark: vertex-gradient accumulation strategies on TPU.

The full-gradient ALS step differentiates `scene.vertices[vidx]` with
vidx = faces[winner_face] over (L, P) winners — the stock gather transpose
is a duplicate-index scatter-add of L*P*3 rows into a (V, 3) buffer.  This
measures that scatter against scatter-free reformulations so the backward
redesign is driven by numbers, not folklore.

Timing: the axon TPU tunnel misreports async readiness (block_until_ready
returns early — see bench.py), so every variant runs ITERS chained steps
inside ONE jitted fori_loop whose carry depends on the previous output, and
the wall clock brackets a scalar fetch.

Variants
  gather        forward verts[vidx] (baseline traffic)
  scatter_dup   zeros.at[vidx].add(g)             — the stock transpose
  scatter_uniq  same with unique_indices=True     — UNSOUND here (duplicate
                winners exist); timed only to expose the serialization tax
  sort_seg      static-permutation gather + cumsum + boundary-diff
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("SB_ITERS", 10))


def timed(step, init_args):
    """step(carry, *args) -> array; chained ITERS times inside one jit."""
    @jax.jit
    def run(n, *args):
        def body(_, acc):
            out = step(acc, *args)
            return acc + jnp.sum(out[0])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    _ = float(run(1, *init_args))                 # compile + warm
    t0 = time.perf_counter()
    _ = float(run(ITERS, *init_args))
    return (time.perf_counter() - t0) / ITERS


def main():
    V = int(os.environ.get("SB_V", 2_500_000))
    F = int(os.environ.get("SB_F", 5_000_000))
    Np = int(os.environ.get("SB_N", 2 * 1_048_576))
    rng = np.random.default_rng(0)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    fw = rng.integers(0, F, Np).astype(np.int32)
    vidx_np = faces[fw]                      # (Np, 3)
    g_np = rng.standard_normal((Np, 3, 3)).astype(np.float32)

    vidx = jax.device_put(jnp.asarray(vidx_np))
    g = jax.device_put(jnp.asarray(g_np))
    verts = jax.device_put(jnp.asarray(
        rng.standard_normal((V, 3)).astype(np.float32)))

    def gather(acc, verts, vidx):
        return (verts + acc * 1e-30)[vidx].reshape(-1, 3)

    def scatter_dup(acc, vidx, g):
        return jnp.zeros((V, 3), jnp.float32).at[vidx].add(g + acc * 1e-30)

    def scatter_uniq(acc, vidx, g):
        return jnp.zeros((V, 3), jnp.float32).at[vidx].add(
            g + acc * 1e-30, unique_indices=True, mode="promise_in_bounds")

    # host-precomputed sort permutation (STATIC in the ladder formulation)
    flat_idx = vidx_np.reshape(-1)
    perm_np = np.argsort(flat_idx, kind="stable").astype(np.int32)
    sorted_idx = flat_idx[perm_np]
    starts_np = np.searchsorted(sorted_idx, np.arange(V)).astype(np.int32)
    perm = jax.device_put(jnp.asarray(perm_np))
    starts = jax.device_put(jnp.asarray(starts_np))

    def sort_seg(acc, perm, starts, g):
        rows = (g + acc * 1e-30).reshape(-1, 3)[perm]
        csum = jnp.concatenate(
            [jnp.zeros((1, 3), jnp.float32), jnp.cumsum(rows, axis=0)])
        ends = jnp.concatenate([starts[1:], jnp.asarray(
            [rows.shape[0]], jnp.int32)])
        return csum[ends] - csum[starts]                 # (V, 3)

    print(f"V={V} F={F} N={Np} rows={Np*3} iters={ITERS}")
    for name, fn, args in [
            ("gather", gather, (verts, vidx)),
            ("scatter_dup", scatter_dup, (vidx, g)),
            ("scatter_uniq", scatter_uniq, (vidx, g)),
            ("sort_seg", sort_seg, (perm, starts, g))]:
        try:
            dt = timed(fn, args)
            print(f"{name:14s} {dt*1e3:9.2f} ms")
        except Exception as exc:   # noqa: BLE001
            print(f"{name:14s} FAILED {type(exc).__name__}: {exc}")
        sys.stdout.flush()

    # correctness: sort_seg == scatter_dup
    a = np.asarray(scatter_dup(0.0, vidx, g))
    b = np.asarray(sort_seg(0.0, perm, starts, g))
    err = np.abs(a - b).max()
    print(f"sort_seg max |delta| vs scatter_dup = {err:.3e}")


if __name__ == "__main__":
    main()
