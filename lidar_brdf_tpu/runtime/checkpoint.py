"""Checkpoint / resume.

The reference only caches *data* (mesh .bin, BRDF database.bin, incremental
per-iteration PLY dumps — SURVEY.md §5).  Production TPU runs need real
resume, so this module covers both:

* ``ChunkCheckpointer`` — long chunked simulations: persist each finished
  chunk's compacted point cloud + cursor; resume skips completed chunks
  (generalizes the reference's incremental TLS-path PLY dumps,
  `LiDARSimulation.cpp:269-271`).
* ``save_params`` / ``load_params`` — material-parameter optimization state
  (MaterialTable pytrees + opt step), plain .npz, host-side.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..core.types import MaterialTable, PointCloud, concat_pointclouds


class ChunkCheckpointer:
    """Directory-backed chunk log: `chunk_<i>.npz` + `state.json`."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.state_path = os.path.join(directory, "state.json")

    def completed_chunks(self) -> int:
        if not os.path.exists(self.state_path):
            return 0
        with open(self.state_path) as fh:
            return json.load(fh).get("completed_chunks", 0)

    def save_chunk(self, index: int, cloud: PointCloud) -> None:
        compact = cloud.compact_host()
        path = os.path.join(self.dir, f"chunk_{index}.npz")
        tmp = path + ".tmp.npz"   # np.savez appends .npz to odd suffixes
        np.savez_compressed(tmp, **{
            f.name: np.asarray(getattr(compact, f.name))
            for f in dataclasses.fields(PointCloud)})
        os.replace(tmp, path)
        with open(self.state_path + ".tmp", "w") as fh:
            json.dump({"completed_chunks": index + 1}, fh)
        os.replace(self.state_path + ".tmp", self.state_path)

    def load_chunk(self, index: int) -> PointCloud:
        data = np.load(os.path.join(self.dir, f"chunk_{index}.npz"))
        return PointCloud(**{k: data[k] for k in data.files})

    def load_all(self) -> PointCloud | None:
        n = self.completed_chunks()
        if n == 0:
            return None
        return concat_pointclouds([self.load_chunk(i) for i in range(n)])


def save_params(path: str, materials: MaterialTable, step: int = 0,
                **extra) -> None:
    arrays = {f.name: np.asarray(getattr(materials, f.name))
              for f in dataclasses.fields(MaterialTable)}
    arrays["__step__"] = np.asarray(step)
    for k, v in extra.items():
        arrays[k] = np.asarray(v)
    tmp = path + ".tmp.npz"   # np.savez appends .npz to odd suffixes
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_params(path: str) -> tuple[MaterialTable, int, dict]:
    data = np.load(path)
    fields = {f.name for f in dataclasses.fields(MaterialTable)}
    mats = MaterialTable(**{k: data[k] for k in data.files if k in fields})
    step = int(data["__step__"]) if "__step__" in data.files else 0
    extra = {k: data[k] for k in data.files
             if k not in fields and k != "__step__"}
    return mats, step, extra
