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


def render_overlays(scene, cloud: PointCloud | None, cfg, path: str, *,
                    bvh=None, rays=None, num_rays: int = 200,
                    bvh_depth: int = 4, axes: tuple[int, int] = (0, 2),
                    point_size: float = 0.5, dpi: int = 150) -> str:
    """Scene-debug overlays: rays, BVH boxes, beam cone, max-range disc.

    The scripted equivalent of the reference viewer's overlay draws
    (`LiDARScene.cpp:269-330` + DrawRay3D/DrawAABB/beam-cone/max-range-disc
    classes): a 2D projection with
      * the point cloud (height-colored),
      * a subsample of sensor rays as origin->hit (or origin->max_range
        for misses) segments,
      * the top ``bvh_depth`` levels of BVH node AABBs as rectangles,
      * the sensor's max-range disc (circle around the TLS position /
        first ALS position), and
      * the beam FOV cone edges for TLS sensors.

    ``rays`` is an optional RayBundle to draw; without it, ray segments
    are reconstructed from the cloud's recorded start/direction-free
    fields (position only, so rays draw sensor->point).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle

    ax0, ax1 = axes
    fig, ax = plt.subplots(figsize=(9, 9))

    # point cloud backdrop
    if cloud is not None:
        compact = cloud.compact_host()
        pos = np.asarray(compact.position)
        if len(pos):
            ax.scatter(pos[:, ax0], pos[:, ax1], s=point_size,
                       c=pos[:, 1], cmap="viridis", linewidths=0, zorder=1)

    # sensor position (TLS position or ALS start)
    sensor = np.asarray(
        cfg.tls_position if getattr(cfg, "is_terrestrial", True)
        else cfg.als_position, np.float64)

    # ray overlay (`DrawRay3D`)
    if rays is not None:
        o = np.asarray(rays.origin, np.float64).reshape(-1, 3)
        d = np.asarray(rays.direction, np.float64).reshape(-1, 3)
        step = max(len(o) // max(num_rays, 1), 1)
        o, d = o[::step], d[::step]
        ends = o + d * float(cfg.max_range)
        if cloud is not None and len(pos):
            pass  # endpoints at max range; hits already shown as points
        for a_, b_ in zip(o, ends):
            ax.plot([a_[ax0], b_[ax0]], [a_[ax1], b_[ax1]],
                    color="orange", lw=0.3, alpha=0.5, zorder=2)
    elif cloud is not None and len(pos):
        step = max(len(pos) // max(num_rays, 1), 1)
        for p in pos[::step]:
            ax.plot([sensor[ax0], p[ax0]], [sensor[ax1], p[ax1]],
                    color="orange", lw=0.3, alpha=0.5, zorder=2)

    # BVH node boxes, top levels (`DrawAABB` of the cluster tree)
    if bvh is not None:
        node_min = np.asarray(bvh.node_min)
        node_max = np.asarray(bvh.node_max)
        node_face = np.asarray(bvh.node_face)
        node_skip = np.asarray(bvh.node_skip)
        frontier = [(0, 0)]
        while frontier:
            node, depth = frontier.pop()
            lo, hi = node_min[node], node_max[node]
            ax.add_patch(Rectangle(
                (lo[ax0], lo[ax1]), hi[ax0] - lo[ax0], hi[ax1] - lo[ax1],
                fill=False, edgecolor="red", lw=max(1.2 - 0.25 * depth, 0.2),
                alpha=0.6, zorder=3))
            if depth + 1 < bvh_depth and node_face[node] < 0:
                left = node + 1
                right = int(node_skip[left])
                frontier.append((left, depth + 1))
                if right < node_face.shape[0]:
                    frontier.append((right, depth + 1))

    # max-range disc (`LiDARScene` max-range overlay)
    ax.add_patch(Circle((sensor[ax0], sensor[ax1]), float(cfg.max_range),
                        fill=False, edgecolor="blue", ls="--", lw=1.0,
                        alpha=0.8, zorder=4))
    ax.plot([sensor[ax0]], [sensor[ax1]], marker="*", ms=12, color="blue",
            zorder=5)

    # TLS beam cone edges (horizontal FOV wedge in the XZ projection)
    if getattr(cfg, "is_terrestrial", True) and axes == (0, 2):
        mid = np.deg2rad(getattr(cfg, "tls_middle_angle_horizontal", 0.0))
        half = np.deg2rad(getattr(cfg, "tls_fov_horizontal", 360.0)) / 2.0
        if half < np.pi:        # full-circle FOV has no wedge edges
            for aa in (mid - half, mid + half):
                e = sensor + float(cfg.max_range) * np.array(
                    [np.cos(aa), 0.0, np.sin(aa)])
                ax.plot([sensor[ax0], e[ax0]], [sensor[ax1], e[ax1]],
                        color="blue", lw=1.0, alpha=0.8, zorder=4)

    ax.set_aspect("equal")
    ax.set_title("overlays: rays / BVH boxes / beam cone / max-range disc")
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path


# 20-entry categorical palette (tab20-like) for semantic/ASPRS face colors
_PALETTE = np.array([
    [0.12, 0.47, 0.71], [0.68, 0.78, 0.91], [1.00, 0.50, 0.05],
    [1.00, 0.73, 0.47], [0.17, 0.63, 0.17], [0.60, 0.87, 0.54],
    [0.84, 0.15, 0.16], [1.00, 0.60, 0.59], [0.58, 0.40, 0.74],
    [0.77, 0.69, 0.84], [0.55, 0.34, 0.29], [0.77, 0.61, 0.58],
    [0.89, 0.47, 0.76], [0.97, 0.71, 0.82], [0.50, 0.50, 0.50],
    [0.78, 0.78, 0.78], [0.74, 0.74, 0.13], [0.86, 0.86, 0.55],
    [0.09, 0.75, 0.81], [0.62, 0.85, 0.90]], np.float32)


def render_ortho(scene, path: str, *, mode: str = "kad", size: int = 512
                 ) -> dict:
    """Top-down orthographic backdrop for path drawing (no GL, no deps).

    The reference captures an aerial ortho view into an FBO texture and
    draws the TLS/ALS path canvas on top of it (`LiDARScene.cpp:118-163`,
    `GUI.cpp:160-272`).  Here: a numpy z-buffer rasterization of the scene
    faces onto the XZ plane, written as PNG by the bundled codec.

    Pixel coordinates ARE canvas coordinates: pixel (col u, row v) maps to
    world (x, z) exactly as `api.tls_path_from_canvas` /
    `SensorConfig.als_manual_path` map canvas points with
    ``canvas_size=(W, H)`` — so a path drawn in image pixels feeds those
    APIs unchanged (row 0 = min Z; flip vertically for display if you want
    +Z up).

    ``mode``: 'kad' (baked diffuse albedo), 'semantic', 'asprs', 'height'.
    Returns {path, canvas_size, world_min, world_size} (the mapping info).
    """
    from .io.png import write_png

    V = np.asarray(scene.vertices, np.float64)
    F = np.asarray(scene.faces)
    lo, hi = V.min(axis=0), V.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    W = H = int(size)
    # world -> pixel (match tls_path_from_canvas: world = px/W*size+min)
    px = (V[:, 0] - lo[0]) / span[0] * W
    pz = (V[:, 2] - lo[2]) / span[2] * H

    if mode == "kad":
        kad = np.asarray(scene.vertex_kad, np.float64)
        fcol = kad[F].mean(axis=1)
    elif mode in ("semantic", "asprs"):
        labels = np.asarray(getattr(scene, f"comp_{mode}"))
        fcol = _PALETTE[labels[np.asarray(scene.face_comp)] % len(_PALETTE)]
    elif mode == "height":
        fy = V[F, 1].mean(axis=1)
        t = (fy - lo[1]) / span[1]
        fcol = np.stack([t, 0.2 + 0.6 * t, 1.0 - t], axis=1)
    else:
        raise ValueError(f"unknown ortho mode {mode!r}")

    img = np.zeros((H, W, 3), np.float32)
    zbuf = np.full((H, W), -np.inf)
    tri_px = np.stack([px[F], pz[F]], axis=-1)          # (F, 3, 2)
    tri_y = V[F, 1]                                     # (F, 3)
    order = np.argsort(tri_y.mean(axis=1))              # low first
    for fi in order:
        t2 = tri_px[fi]
        x0, y0 = np.floor(t2.min(axis=0)).astype(int)
        x1, y1 = np.ceil(t2.max(axis=0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W - 1), min(y1, H - 1)
        if x1 < x0 or y1 < y0:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1) + 0.5,
                             np.arange(y0, y1 + 1) + 0.5)
        a, b, c = t2[0], t2[1], t2[2]
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-12:
            continue
        l1 = ((gx - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (gy - a[1])) / det
        l2 = ((b[0] - a[0]) * (gy - a[1]) - (gx - a[0]) * (b[1] - a[1])) / det
        l0 = 1.0 - l1 - l2
        inside = (l0 >= -1e-9) & (l1 >= -1e-9) & (l2 >= -1e-9)
        if not inside.any():
            continue
        depth = l0 * tri_y[fi, 0] + l1 * tri_y[fi, 1] + l2 * tri_y[fi, 2]
        sub_z = zbuf[y0:y1 + 1, x0:x1 + 1]
        upd = inside & (depth > sub_z)
        sub_z[upd] = depth[upd]
        img[y0:y1 + 1, x0:x1 + 1][upd] = fcol[fi]
    write_png(path, img)
    return {"path": path, "canvas_size": (W, H),
            "world_min": (float(lo[0]), float(lo[2])),
            "world_size": (float(span[0]), float(span[2]))}
