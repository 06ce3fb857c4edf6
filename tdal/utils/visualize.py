"""Visualization helpers: BEV matplotlib renders (headless) + gated open3d viewers.

Capability parity with reference ``tools/visualize/vis_{data,track,pred}.py`` (open3d
linesets + text labels). The TPU environment is headless, so the default backend
renders BEV PNGs with matplotlib; when open3d is installed the interactive 3D viewer
is available via ``show_open3d``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

CLASS_COLORS = {0: "tab:green", 1: "tab:red", 2: "tab:orange", 4: "tab:purple"}


def _box_corners_bev(box7: np.ndarray) -> np.ndarray:
    x, y, _, l, w, _, h = box7
    local = np.array([[-l / 2, -w / 2], [-l / 2, w / 2], [l / 2, w / 2], [l / 2, -w / 2]])
    c, s = np.cos(h), np.sin(h)
    return local @ np.array([[c, s], [-s, c]]) + np.array([x, y])


def plot_bev(
    points: Optional[np.ndarray] = None,
    boxes: Optional[np.ndarray] = None,
    labels: Optional[Sequence] = None,
    gt_boxes: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
    title: str = "",
    xlim=(-80, 80),
    ylim=(-80, 80),
):
    """Render a BEV frame: points (N, >=2), boxes/gt_boxes (M, 7) lidar convention."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.2, c="0.6", linewidths=0)
    if gt_boxes is not None:
        for b in np.atleast_2d(gt_boxes):
            corners = _box_corners_bev(np.asarray(b, float)[:7])
            ax.plot(*np.vstack([corners, corners[:1]]).T, c="tab:blue", lw=1.0)
    if boxes is not None:
        for i, b in enumerate(np.atleast_2d(boxes)):
            corners = _box_corners_bev(np.asarray(b, float)[:7])
            color = CLASS_COLORS.get(
                labels[i] if labels is not None else 0, "tab:red"
            )
            ax.plot(*np.vstack([corners, corners[:1]]).T, c=color, lw=1.0)
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.set_title(title)
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_track(track: dict, annos, out_path=None, title=""):
    """Render one track's global-frame boxes + merged points."""
    boxes = np.stack([np.asarray(b).reshape(-1)[:7] for b in track["bbox"]])
    pts = np.concatenate([np.asarray(p).reshape(-1, 3) for p in track["point"]], axis=0)
    c = boxes[:, :2].mean(0)
    return plot_bev(
        points=pts,
        boxes=boxes,
        out_path=out_path,
        title=title,
        xlim=(c[0] - 30, c[0] + 30),
        ylim=(c[1] - 30, c[1] + 30),
    )


def show_open3d(points, boxes=None):
    """Interactive 3D viewer; requires the optional open3d package
    (reference tools/visualize/vis_data.py:5)."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed in this environment; use plot_bev for headless "
            "PNG rendering instead"
        ) from e

    geo = [o3d.geometry.PointCloud(o3d.utility.Vector3dVector(np.asarray(points)[:, :3]))]
    if boxes is not None:
        from tdal.data.waymo_schema import rotz_np

        lines = [
            [0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
            [0, 4], [1, 5], [2, 6], [3, 7],
        ]
        for b in np.atleast_2d(boxes):
            x, y, z, l, w, h, yaw = b[:7]
            local = np.array(
                [
                    [sx * l / 2, sy * w / 2, sz * h / 2]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
                ]
            )[[0, 2, 6, 4, 1, 3, 7, 5]]
            corners = local @ rotz_np(yaw).T + np.array([x, y, z])
            ls = o3d.geometry.LineSet(
                o3d.utility.Vector3dVector(corners), o3d.utility.Vector2iVector(lines)
            )
            geo.append(ls)
    o3d.visualization.draw_geometries(geo)
