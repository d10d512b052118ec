"""Scatter-free vertex-gradient accumulation via static block unions.

The inverse-geometry training step differentiates the winner-triangle
vertex gather ``scene.vertices[faces[winner_face]]`` over (L levels, P
pulses).  The stock gather transpose is a duplicate-index scatter-add of
L*P*3 rows into the (V, 3) vertex-gradient buffer — and XLA:TPU lowers
scatter to a SERIALIZED update loop at ~64 ns/row (measured v5e,
scripts/scatter_bench.py): 380 ms/step at the ALS BASELINE shape, the
single largest line in the step profile.

This module replaces it with a formulation whose only dynamic-index ops
are dense or latency-hidden gathers, exploiting one structural fact of the
beam-culled pipeline: a pulse's winner face always comes from its host-built
CANDIDATE LADDER, so the set of vertices a 128-pulse block can touch is
STATIC.  Pipeline (see `_winner_verts_bwd` in physics/returns.py):

  1. one-hot union accumulate (dynamic, dense VPU): for each block, compare
     the L*128*3 winner-corner vertex ids against the block's static union
     list (``uvert``) and masked-sum the corner cotangents — a broadcast
     compare fused into a reduce, no materialized one-hot, no MXU.
  2. static segment-sum: the (NB*U,) union entries have HOST-KNOWN vertex
     ids, so a precomputed permutation sorts them by vertex; a cumulative
     sum + boundary difference (``bounds``) lands the dense (V, 3) gradient
     with two static-index gathers and zero scatters.

Entries padded with id == num_verts drop out via the bounds table (their
segment lies past ``bounds[V]``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax

_pytree = jax.tree_util.register_dataclass


@_pytree
@dataclass
class VertexGradAux:
    """Static data for the scatter-free winner-vertex backward.

    uvert  (NB, U) int32 — per-block union vertex ids, padded with V
    perm   (NB*U,) int32 — sorts flattened union entries by vertex id
    bounds (V+1,)  int32 — segment [bounds[v], bounds[v+1]) per vertex in
                           the sorted order (pad entries past bounds[V])

    Static metadata (`block_pulses`, `num_pulses`, `faces_fingerprint`)
    rides outside the pytree leaves so `check_consistent` can detect an aux
    built for a different scene/chunk (a stale BENCH_STATE_CACHE, a
    different pulse permutation) BEFORE it silently produces wrong vertex
    gradients (advisor r04, medium).
    """

    uvert: jax.Array
    perm: jax.Array
    bounds: jax.Array
    block_pulses: int = field(metadata=dict(static=True), default=128)
    num_pulses: int = field(metadata=dict(static=True), default=-1)
    faces_fingerprint: int = field(metadata=dict(static=True), default=0)

    def check_consistent(self, faces, num_pulses: int | None = None) -> None:
        """Raise if this aux was built for different faces / pulse count.

        Call with CONCRETE (host) arrays — e.g. from `Simulator` or bench
        setup code, outside jit.  `faces_fingerprint` hashes the face-index
        array, so a reordered/modified mesh or a mismatched chunk length
        fails loudly instead of dropping gradient contributions.
        """
        if num_pulses is not None and self.num_pulses not in (-1, num_pulses):
            raise ValueError(
                f"VertexGradAux built for {self.num_pulses} pulses, "
                f"used with {num_pulses}")
        if self.faces_fingerprint:
            fp = faces_fingerprint(np.asarray(faces))
            if fp != self.faces_fingerprint:
                raise ValueError(
                    "VertexGradAux faces fingerprint mismatch: aux was "
                    "built for a different mesh (stale cache?)")


def faces_fingerprint(faces: np.ndarray) -> int:
    """Cheap order-sensitive hash of the (F, 3) face-index array."""
    a = np.ascontiguousarray(np.asarray(faces, np.int64))
    return int(hash(a.tobytes()) & 0x7FFFFFFFFFFFFFFF) or 1


def build_vertex_grad_aux(faces: np.ndarray, buckets, num_pulses: int,
                          num_verts: int, *,
                          block_pulses: int = 128) -> "VertexGradAux":
    """Host-side aux construction from bucket-contiguous pulse ladders.

    ``buckets``: raw `build_pulse_ladders` output whose rows, after the
    `permute_pulse_ladders` reorder, cover pulses [0, covered) contiguously
    (the bench/Simulator pulse path).  Zero-candidate tail pulses have no
    candidates and can never produce winners.
    """
    import jax.numpy as jnp

    faces = np.asarray(faces, np.int64)
    if num_pulses % block_pulses:
        raise ValueError(f"{num_pulses} pulses not divisible by "
                         f"{block_pulses}-pulse blocks")
    nb = num_pulses // block_pulses
    # per-pulse candidate rows, bucket-contiguous: bucket k's real rows
    # occupy pulses [start, start+B) in permuted order
    block_vids: list[np.ndarray] = [None] * nb
    start = 0
    spans = []
    for pidx, cand in buckets:
        B = int((np.asarray(pidx) < num_pulses).sum())   # real rows first
        spans.append((start, B, np.asarray(cand)[:B]))
        start += B

    uvert_rows = []
    max_u = 1
    for b in range(nb):
        p0, p1 = b * block_pulses, (b + 1) * block_pulses
        ids = []
        for s, B, cand in spans:
            lo, hi = max(p0, s), min(p1, s + B)
            if lo < hi:
                ids.append(cand[lo - s:hi - s].reshape(-1))
        if ids:
            cand_ids = np.concatenate(ids)
            cand_ids = cand_ids[cand_ids >= 0]
        else:
            cand_ids = np.zeros(0, np.int64)
        vids = (np.unique(faces[cand_ids].reshape(-1))
                if cand_ids.size else np.zeros(0, np.int64))
        uvert_rows.append(vids)
        max_u = max(max_u, vids.size)

    U = -(-max_u // 128) * 128
    uvert = np.full((nb, U), num_verts, np.int64)
    for b, vids in enumerate(uvert_rows):
        uvert[b, :vids.size] = vids

    flat = uvert.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    sorted_ids = flat[perm]
    bounds = np.searchsorted(sorted_ids,
                             np.arange(num_verts + 1)).astype(np.int32)
    return VertexGradAux(uvert=jnp.asarray(uvert.astype(np.int32)),
                         perm=jnp.asarray(perm),
                         bounds=jnp.asarray(bounds),
                         block_pulses=block_pulses,
                         num_pulses=num_pulses,
                         faces_fingerprint=faces_fingerprint(faces))
