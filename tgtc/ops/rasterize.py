"""TPU-native point-splat rasterizer + camera math.

Replaces the reference's pytorch3d dependency (``Camera.rasterize``,
/root/reference/models.py:302-358): splat a colored 3-D point cloud into B
target views with a z-buffer, returning (warped rgb, warped coor map, hit
mask). This powers the Phase-C temporal-consistency loss
(/root/reference/train_style_modules.py:467-482).

Design: instead of pytorch3d's CUDA bin-raster (+ the reference's
``PixeltoCvv`` probe hack to recover its pixel mapping), we project points
to continuous pixel coordinates directly and do a **two-pass segment-min
z-buffer**: pass 1 scatter-mins depth per pixel, pass 2 scatter-mins the
winning point index among depth-ties, then gathers features. Fully
vectorized (VPU + scatter), deterministic, and differentiable w.r.t. the
point features (gather backward = scatter-add), matching what the temporal
loss needs — pytorch3d also only propagates feature gradients here.

Camera conventions are the reference's: OpenGL-style projection matrix
(/root/reference/train_style_modules.py:397-400), NDC-to-world inversion
(/root/reference/train_style_modules.py:537-542), and the cvv→pixel mapping
implied by ``PixeltoCvv`` (cvv +1 → pixel 0, −1 → pixel max, both axes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def llff_projection_matrix(h: int, w: int, focal: float,
                           near: float = 1e-3, far: float = 1e5,
                           cx: float = None, cy: float = None) -> np.ndarray:
    """The reference's OpenGL projection
    (/root/reference/train_style_modules.py:394-400)."""
    cx = w / 2 if cx is None else cx
    cy = h / 2 if cy is None else cy
    return np.array(
        [
            [-2 * focal / w, 0, 1 - 2 * cx / w, 0],
            [0, 2 * focal / h, 2 * cy / h - 1, 0],
            [0, 0, -(far + near) / (far - near), -2 * far * near / (far - near)],
            [0, 0, -1, 0],
        ],
        np.float32,
    )


def ndc_to_world(coor_ndc: jnp.ndarray, h: int, w: int, focal: float
                 ) -> jnp.ndarray:
    """Invert the NDC projection for LLFF coor maps
    (parity with ``ndc2world``, /root/reference/train_style_modules.py:537)."""
    z = 2.0 / (coor_ndc[..., 2] - 1.0)
    x = -w / 2.0 / focal * z * coor_ndc[..., 0]
    y = -h / 2.0 / focal * z * coor_ndc[..., 1]
    return jnp.stack([x, y, z], axis=-1)


def world_to_cvv(coor_world: jnp.ndarray, w2c: jnp.ndarray,
                 proj: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World → canonical view volume. Returns (cvv [..., 3], w_clip [...]).

    ``w_clip > 0`` marks points in front of the camera.
    Parity with ``Camera.WorldtoCVV`` (/root/reference/models.py:291-295).
    """
    ones = jnp.ones_like(coor_world[..., :1])
    hom = jnp.concatenate([coor_world, ones], axis=-1)
    cam = jnp.einsum("cw,...w->...c", w2c, hom)
    clip = jnp.einsum("vc,...c->...v", proj, cam)
    w_clip = clip[..., 3]
    cvv = clip[..., :3] / jnp.where(w_clip == 0, 1e-8, w_clip)[..., None]
    return cvv, w_clip


def cvv_to_pixel(cvv: jnp.ndarray, h: int, w: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cvv (+1 → pixel 0; −1 → pixel max on both axes — the mapping the
    reference recovers via its PixeltoCvv probe, /root/reference/models.py:
    307-333) → continuous (px, py)."""
    px = (1.0 - (cvv[..., 0] + 1.0) / 2.0) * (w - 1)
    py = (1.0 - (cvv[..., 1] + 1.0) / 2.0) * (h - 1)
    return px, py


@functools.partial(jax.jit, static_argnames=("h", "w", "radius"))
def splat_points(
    coor_world: jnp.ndarray,   # [N, 3] world points (one per source pixel)
    features: jnp.ndarray,     # [N, F] features to warp (rgb, coor, ...)
    w2c: jnp.ndarray,          # [B, 4, 4] world→camera for target views
    proj: jnp.ndarray,         # [4, 4] projection matrix
    h: int,
    w: int,
    radius: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Z-buffer splat of a point cloud into B target views.

    Returns (warped [B, h, w, F], mask [B, h, w, 1]). Each pixel takes the
    features of the nearest covering point (top-1, the reference's ``z=1``
    at /root/reference/models.py:347); coverage = pixel centers within
    ``radius`` pixels of the projected point (the reference's ``k=1.5``
    pytorch3d radius, /root/reference/models.py:346).
    """
    n, f = features.shape
    r_int = int(np.ceil(radius))
    offs = np.arange(-r_int, r_int + 1)
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    ox = jnp.asarray(ox.reshape(-1))  # [K]
    oy = jnp.asarray(oy.reshape(-1))
    k = ox.shape[0]
    big = jnp.int32(n)  # sentinel "no point"

    def one_view(w2c_i):
        cvv, w_clip = world_to_cvv(coor_world, w2c_i, proj)
        px, py = cvv_to_pixel(cvv, h, w)
        depth = cvv[..., 2]
        in_front = w_clip > 1e-6

        cx = jnp.round(px).astype(jnp.int32)[:, None] + ox[None, :]  # [N, K]
        cy = jnp.round(py).astype(jnp.int32)[:, None] + oy[None, :]
        d2 = (cx.astype(jnp.float32) - px[:, None]) ** 2 + (
            cy.astype(jnp.float32) - py[:, None]
        ) ** 2
        valid = (
            (d2 <= radius * radius)
            & (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            & in_front[:, None]
        )
        pid = jnp.where(valid, cy * w + cx, h * w)  # dump slot h*w
        pid_flat = pid.reshape(-1)

        depth_b = jnp.broadcast_to(depth[:, None], (n, k)).reshape(-1)
        depth_b = jnp.where(valid.reshape(-1), depth_b, jnp.inf)
        min_depth = jax.ops.segment_min(
            depth_b, pid_flat, num_segments=h * w + 1
        )

        # winner among depth ties: smallest point index
        is_win = depth_b <= min_depth[pid_flat] + 0.0
        idx_b = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)
        ).reshape(-1)
        idx_key = jnp.where(is_win & valid.reshape(-1), idx_b, big)
        win = jax.ops.segment_min(
            idx_key, pid_flat, num_segments=h * w + 1
        )[: h * w]

        mask = (win < big)[:, None].astype(features.dtype)  # [h*w, 1]
        gathered = features[jnp.minimum(win, n - 1)] * mask
        return (
            gathered.reshape(h, w, f),
            mask.reshape(h, w, 1),
        )

    warped, mask = jax.vmap(one_view)(w2c)
    return warped, mask


def rasterize_pyramid(
    coor_world: jnp.ndarray,
    rgb: jnp.ndarray,
    cam_poses: jnp.ndarray,
    proj: jnp.ndarray,
    h: int,
    w: int,
    radii=(0.7, 1.2, 1.7, 2.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-radius splat compositing (parity with ``rasterize_pyramid``,
    /root/reference/models.py:360-369): accumulate images over growing splat
    radii, masking by the intersection of hit masks."""
    image = None
    mask = None
    for k in radii:
        img, _, msk = rasterize_warp(coor_world, rgb, cam_poses, proj, h, w,
                                     radius=float(k))
        mask = msk if mask is None else mask * msk
        image = img if image is None else image + img * mask
    return image, mask


def rasterize_warp(
    coor_world: jnp.ndarray,  # [N, 3]
    rgb: jnp.ndarray,         # [N, 3]
    cam_poses: jnp.ndarray,   # [B, 4, 4] camera-to-world
    proj: jnp.ndarray,        # [4, 4]
    h: int,
    w: int,
    radius: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full ``Camera.rasterize`` equivalent: returns
    (rgb_map [B,h,w,3], coor_map [B,h,w,3], mask [B,h,w,1]) — the source
    view's stylized colors AND world coordinates warped into each target
    view (/root/reference/models.py:336,355-358)."""
    w2c = jnp.linalg.inv(cam_poses)
    feats = jnp.concatenate([rgb, coor_world], axis=-1)
    warped, mask = splat_points(coor_world, feats, w2c, proj, h, w, radius)
    return warped[..., :3], warped[..., 3:], mask
