"""Per-face vertex-adjacency table for the footprint merge.

The reference's pulse merge ORs an `areTriangleContiguous` test — same model
component AND >= 1 shared vertex (`reduceCollisions-comp.glsl:54-62,214`) —
into the footprint criterion.  Evaluating that on TPU from raw face data
costs one (pulses x rays)-row gather of the per-ray face vertices per step
(~7.6 ms at 1.3M rays on v5e: TPU gathers are priced per row).

This module precomputes the test on the HOST instead: for every face, the
padded list of faces it is contiguous with.  At runtime the merge gathers
ONE neighbor row per pulse (the winner's) and compares ray face ids against
it densely — (pulses)-row gather + elementwise compares, no per-ray gather.
The table is exact (padded to the scene's true max neighbor count), so the
merge semantics are bit-identical to the gather formulation.
"""

from __future__ import annotations

import numpy as np

# Scenes with hub vertices (huge fans) would blow the table up; above this
# width callers should keep the per-ray gather path instead.
DEFAULT_CAP = 64
_CHUNK_CORNERS = 3 * 1_000_000    # bound peak host memory on big scenes


def build_face_neighbors(faces: np.ndarray, face_comp: np.ndarray,
                         cap: int = DEFAULT_CAP) -> np.ndarray | None:
    """(F, MAXN) int32: faces sharing >=1 vertex + same component, -1 pad.

    Self is excluded (the runtime merge tests ``face == winner`` separately).
    Returns None when the scene's max neighbor count exceeds ``cap``.
    """
    faces = np.asarray(faces, np.int64)
    face_comp = np.asarray(face_comp, np.int64)
    F = faces.shape[0]
    if F == 0:
        return np.zeros((0, 1), np.int32)
    flat = faces.reshape(-1)
    frep = np.repeat(np.arange(F, dtype=np.int64), 3)
    order = np.argsort(flat, kind="stable")
    sv, sf = flat[order], frep[order]
    V = int(flat.max()) + 1
    counts = np.bincount(flat, minlength=V)
    gstart = np.zeros(V + 1, np.int64)
    np.cumsum(counts, out=gstart[1:])

    # expand corner -> incident faces of its vertex, chunked over corners
    srcs, nbrs = [], []
    NC = flat.shape[0]
    for lo in range(0, NC, _CHUNK_CORNERS):
        hi = min(lo + _CHUNK_CORNERS, NC)
        v = flat[lo:hi]
        reps = counts[v]
        total = int(reps.sum())
        if total == 0:
            continue
        base = np.repeat(gstart[v], reps)
        csum = np.cumsum(reps) - reps
        offs = np.arange(total, dtype=np.int64) - np.repeat(csum, reps)
        nbr = sf[base + offs]
        src = np.repeat(frep[lo:hi], reps)
        keep = (nbr != src) & (face_comp[nbr] == face_comp[src])
        srcs.append(src[keep])
        nbrs.append(nbr[keep])
    if not srcs:
        return np.full((F, 1), -1, np.int32)
    src = np.concatenate(srcs)
    nbr = np.concatenate(nbrs)

    # dedup (src, nbr) pairs, then pad per-face rows to the true max width
    order = np.lexsort((nbr, src))
    src, nbr = src[order], nbr[order]
    first = np.ones(src.shape[0], bool)
    first[1:] = (src[1:] != src[:-1]) | (nbr[1:] != nbr[:-1])
    src, nbr = src[first], nbr[first]
    per_face = np.bincount(src, minlength=F)
    maxn = int(per_face.max()) if per_face.size else 0
    if maxn > cap:
        return None
    out = np.full((F, max(maxn, 1)), -1, np.int32)
    col = np.arange(src.shape[0], dtype=np.int64) \
        - np.repeat(np.cumsum(per_face) - per_face, per_face)
    out[src, col] = nbr.astype(np.int32)
    return out
