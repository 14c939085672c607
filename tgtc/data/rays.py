"""Batched pinhole ray generation + NDC projection (pure jnp).

Parity with the reference's numpy helpers ``get_rays_np`` / ``ndc_rays_np``
(/root/reference/dataset.py:33-61), but vectorized over *all poses at once*
— the reference loops per pose on the host
(/root/reference/dataset.py:106-114); here one jitted broadcast produces the
whole ``[N, H, W, 3]`` ray tensors on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def generate_rays(
    h: int,
    w: int,
    intrinsics: jnp.ndarray,
    c2w: jnp.ndarray,
    pixel_alignment: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel rays for one or more camera-to-world poses.

    Args:
        intrinsics: ``[3, 3]`` pinhole K (fx, fy, cx, cy).
        c2w: ``[..., 3, 4]`` camera-to-world (OpenGL convention: x right,
            y up, z backward — matches LLFF after axis fix).
        pixel_alignment: add half-pixel offset
            (reference /root/reference/dataset.py:35-36).

    Returns:
        ``rays_o [..., H, W, 3]``, ``rays_d [..., H, W, 3]`` (unnormalized,
        like the reference — z-depth parameterization).
    """
    i = jnp.arange(w, dtype=jnp.float32)
    j = jnp.arange(h, dtype=jnp.float32)
    if pixel_alignment:
        i = i + 0.5
        j = j + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    dirs = jnp.stack(
        [
            (ii - intrinsics[0, 2]) / intrinsics[0, 0],
            -(jj - intrinsics[1, 2]) / intrinsics[1, 1],
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )  # [H, W, 3] camera-frame directions
    # rotate into world frame: [..., 3, 3] @ [H, W, 3]
    rays_d = jnp.einsum("hwc,...bc->...hwb", dirs, c2w[..., :3, :3])
    rays_o = jnp.broadcast_to(
        c2w[..., None, None, :3, 3], rays_d.shape
    )
    return rays_o, rays_d


def ndc_rays(
    h: int,
    w: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift origins to the near plane and project into NDC space.

    Parity with ``ndc_rays_np`` (/root/reference/dataset.py:44-61); used for
    forward-facing LLFF scenes so [near, far] maps to [0, 1] depth.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def rays_for_poses(
    h: int,
    w: int,
    intrinsics: jnp.ndarray,
    poses: jnp.ndarray,
    use_ndc: bool = True,
    pixel_alignment: bool = False,
    near: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All rays for a stack of poses ``[N, 3+, 4]`` → ``[N, H, W, 3]`` pair.

    Replaces the reference's per-pose host loop + optional NDC projection
    (/root/reference/dataset.py:104-118) with one jitted computation.
    """
    gen = jax.jit(
        lambda c2w: generate_rays(h, w, intrinsics, c2w, pixel_alignment),
        static_argnums=(),
    )
    rays_o, rays_d = gen(poses[:, :3, :4])
    if use_ndc:
        rays_o, rays_d = ndc_rays(h, w, float(intrinsics[0, 0]), near, rays_o, rays_d)
    return rays_o, rays_d
