"""Point-cloud visualization — PNG export of the reference's render modes.

The reference ships a 12k-LoC OpenGL viewer with 10 point-cloud render modes
(`LiDARScene.cpp:269-330`: RGB, semantic, ASPRS, height, intensity, return
number, normal, scan angle, scan direction, GPS time).  The TPU framework's
equivalent is offline: matplotlib scatter projections colored by the same
attributes.  Useful for notebooks and CI artifact inspection.
"""

from __future__ import annotations

import numpy as np

from .core.types import PointCloud

RENDER_MODES = ("height", "intensity", "return_number", "num_returns",
                "semantic", "asprs", "normal", "scan_angle",
                "scan_direction", "gps_time", "distance")


def _colors(cloud: PointCloud, mode: str):
    a = lambda n: np.asarray(getattr(cloud, n))
    if mode == "height":
        return a("position")[:, 1], "viridis"
    if mode == "intensity":
        v = a("intensity")
        hi = np.percentile(v, 98) if len(v) else 1.0
        return np.clip(v, 0, max(hi, 1e-12)), "inferno"
    if mode == "return_number":
        return a("return_number").astype(float), "tab10"
    if mode == "num_returns":
        return a("num_returns").astype(float), "tab10"
    if mode == "semantic":
        return a("semantic").astype(float), "tab20"
    if mode == "asprs":
        return a("asprs").astype(float), "tab20"
    if mode == "normal":
        return (np.abs(a("normal")) if a("normal").size else None), None
    if mode == "scan_angle":
        return a("scan_angle_rank"), "coolwarm"
    if mode == "scan_direction":
        return np.abs(a("scan_direction")), None
    if mode == "gps_time":
        return a("gps_time"), "plasma"
    if mode == "distance":
        return a("distance"), "magma"
    raise ValueError(f"unknown mode {mode!r}; one of {RENDER_MODES}")


def render_png(cloud: PointCloud, path: str, mode: str = "height",
               axes: tuple[int, int] = (0, 2), point_size: float = 0.5,
               dpi: int = 150, title: str | None = None) -> str:
    """Scatter projection of the (compacted) cloud onto two axes."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    compact = cloud.compact_host()
    pos = np.asarray(compact.position)
    c, cmap = _colors(compact, mode)
    fig, ax = plt.subplots(figsize=(8, 8))
    if c is None or (hasattr(c, "ndim") and c.ndim == 2):
        ax.scatter(pos[:, axes[0]], pos[:, axes[1]], s=point_size,
                   c=c if c is not None else "k", linewidths=0)
    else:
        sc = ax.scatter(pos[:, axes[0]], pos[:, axes[1]], s=point_size, c=c,
                        cmap=cmap, linewidths=0)
        fig.colorbar(sc, ax=ax, shrink=0.7)
    ax.set_aspect("equal")
    ax.set_title(title or f"{mode} ({len(pos)} points)")
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path


def render_all_modes(cloud: PointCloud, prefix: str, **kw) -> list[str]:
    return [render_png(cloud, f"{prefix}_{mode}.png", mode, **kw)
            for mode in RENDER_MODES]
