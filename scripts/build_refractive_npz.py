"""Build the bundled refractive-index dataset.

Parses a folder of reference-format RefractiveIndex tables (tab-separated
``wl  n`` rows, micrometer/nanometer auto-detection — the format read by
`MaterialDatabase::readRefractiveIndexFile`, MaterialDatabase.cpp:129-176)
into one compact ``lidar_brdf_tpu/data/refractive_index.npz``:

    names    (M,)  material names (file stems)
    offsets  (M+1,) row ranges per material into the flat arrays
    wl_nm    (R,)  wavelengths, nanometers
    n        (R,)  refractive indices

The source tables are public optical-constant datasets (refractiveindex.info
et al.) that the reference redistributes as Assets/LiDAR/RefractiveIndex/.

Usage:  python scripts/build_refractive_npz.py <refractive_index_dir> [out]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from lidar_brdf_tpu.io.materials import parse_refractive_index_file  # noqa: E402


def main(src: str, out: str) -> None:
    names, offsets, wl_all, n_all = [], [0], [], []
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".txt"):
            continue
        rows = parse_refractive_index_file(os.path.join(src, fname))
        rows = sorted(rows)
        if not rows:
            continue
        names.append(os.path.splitext(fname)[0])
        wl_all.extend(r[0] for r in rows)
        n_all.extend(r[1] for r in rows)
        offsets.append(len(wl_all))
        print(f"{names[-1]:16s} {len(rows):4d} rows  "
              f"[{rows[0][0]:.0f}, {rows[-1][0]:.0f}] nm")
    np.savez_compressed(
        out,
        names=np.asarray(names),
        offsets=np.asarray(offsets, np.int64),
        wl_nm=np.asarray(wl_all, np.float64),
        n=np.asarray(n_all, np.float64))
    print(f"wrote {out}: {len(names)} materials, {len(wl_all)} rows")


if __name__ == "__main__":
    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "lidar_brdf_tpu", "data",
        "refractive_index.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    main(src, out)
