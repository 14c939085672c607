"""3D IO utilities: PLY point clouds and depth→pointcloud.

Rewrites of the reference's IO grab-bag (/root/reference/utils.py:23-197):
``write_ply_rgb`` / ``read_ply`` (binary little-endian PLY, no plyfile
dependency) and ``dep2pcl`` (depth map + intrinsics + pose → world points).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def write_ply_rgb(path: str, points: np.ndarray,
                  colors: Optional[np.ndarray] = None) -> None:
    """Write ``points [N, 3]`` (+ optional uint8/float ``colors [N, 3]``)
    as binary PLY."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    has_c = colors is not None
    if has_c:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_c:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_c:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
            rec["xyz"], rec["rgb"] = points, colors
            f.write(rec.tobytes())
        else:
            f.write(points.tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read a binary PLY written by :func:`write_ply_rgb` →
    (points [N,3], colors [N,3] uint8 or None)."""
    with open(path, "rb") as f:
        n = 0
        has_c = False
        while True:
            line = f.readline().decode().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property uchar"):
                has_c = True
            elif line == "end_header":
                break
        if has_c:
            rec = np.frombuffer(
                f.read(n * 15),
                dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
            )
            return rec["xyz"].copy(), rec["rgb"].copy()
        pts = np.frombuffer(f.read(n * 12), np.float32).reshape(n, 3)
        return pts.copy(), None


def dep2pcl(depth: np.ndarray, intrinsics: np.ndarray, c2w: np.ndarray,
            pixel_alignment: bool = False) -> np.ndarray:
    """Depth map [H, W] + K + camera-to-world → world points [H*W, 3]
    (parity with ``dep2pcl``, /root/reference/utils.py:~150; OpenGL camera:
    x right, y up, z backward — depth measured along -z)."""
    h, w = depth.shape
    i = np.arange(w, dtype=np.float32)
    j = np.arange(h, dtype=np.float32)
    if pixel_alignment:
        i, j = i + 0.5, j + 0.5
    ii, jj = np.meshgrid(i, j, indexing="xy")
    x = (ii - intrinsics[0, 2]) / intrinsics[0, 0] * depth
    y = -(jj - intrinsics[1, 2]) / intrinsics[1, 1] * depth
    z = -depth
    cam = np.stack([x, y, z, np.ones_like(z)], axis=-1).reshape(-1, 4)
    world = cam @ np.asarray(c2w[:3, :4], np.float32).T
    return world
