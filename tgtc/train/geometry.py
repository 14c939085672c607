"""Phase B — geometry dump (reference ``cal_geometry``,
/root/reference/rendering.py:5-90).

Renders every training pose with the frozen NeRF and writes, per frame:

* ``rgb_%05d.png``   — the NeRF render
* ``depth_%05d.png`` — normalized expected depth
* ``geometry_%05d.npz`` — ``coor_map`` (per-pixel 3-D hit point
  ``t_exp * d + o``), camera pose ``cps``, ``hwf``, ``near``, ``far``

plus a scene-wide ``geometry.npz``. These artifacts feed the Phase-C 2D
style pipeline (content images + warp geometry) and the Phase-E dataset.

TPU-native: whole frames render as a handful of fused-kernel blocks
(tgtc.render.fast) instead of the reference's 1024-ray ``batchify`` chunks;
image encoding happens on host while the next frame renders on device.
"""

from __future__ import annotations

import os


import jax.numpy as jnp
import numpy as np

from tgtc.data.llff import LlffScene
from tgtc.data.rays import rays_for_poses


def _to8b(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    """Async native PNG write (tgtc.utils.native thread pool) so host encode
    overlaps the next frame's device render; PIL fallback inside."""
    from tgtc.utils import native

    if img.ndim == 2:
        img = img[..., None]
    native.write_png_async(path, img)


def dump_geometry(
    renderer,
    scene: LlffScene,
    out_dir: str,
    use_ndc: bool = True,
    pixel_alignment: bool = False,
    block: int = 16384,
    skip_existing: bool = True,
) -> str:
    """Render all training poses and write the Phase-B artifact set.

    ``renderer`` is anything with ``render_image(rays_o, rays_d, block)``
    returning ``{"rgb": [N,3], "t_exp": [N]}`` (FusedNerfRenderer or the
    XLA-path renderer).
    """
    os.makedirs(out_dir, exist_ok=True)
    h, w, _ = scene.hwf
    intr = jnp.asarray(scene.intrinsics)
    poses = jnp.asarray(scene.poses)
    cps = scene.c2w44()

    all_coor = []
    for i in range(scene.poses.shape[0]):
        geo_path = os.path.join(out_dir, f"geometry_{i:05d}.npz")
        if skip_existing and os.path.exists(geo_path):
            all_coor.append(np.load(geo_path)["coor_map"])
            continue
        ro, rd = rays_for_poses(
            h, w, intr, poses[i : i + 1], use_ndc=use_ndc,
            pixel_alignment=pixel_alignment,
        )
        ro_f = jnp.reshape(ro, (-1, 3))
        rd_f = jnp.reshape(rd, (-1, 3))
        out = renderer.render_image(ro_f, rd_f, block=block)
        rgb = np.asarray(out["rgb"]).reshape(h, w, 3)
        t_exp = np.asarray(out["t_exp"]).reshape(h, w)
        # per-pixel 3-D hit point (reference /root/reference/rendering.py:54)
        coor = np.asarray(ro_f + out["t_exp"][:, None] * rd_f).reshape(h, w, 3)

        save_png(os.path.join(out_dir, f"rgb_{i:05d}.png"), _to8b(rgb))
        t_norm = (t_exp - t_exp.min()) / max(t_exp.max() - t_exp.min(), 1e-8)
        save_png(os.path.join(out_dir, f"depth_{i:05d}.png"), _to8b(t_norm))
        np.savez(
            geo_path,
            coor_map=coor.astype(np.float32),
            cps=cps[i].astype(np.float32),
            hwf=np.array([h, w, scene.hwf[2]], np.float32),
            near=np.float32(scene.near),
            far=np.float32(scene.far),
        )
        all_coor.append(coor.astype(np.float32))

    np.savez(
        os.path.join(out_dir, "geometry.npz"),
        coor_maps=np.stack(all_coor, 0),
        cps=cps.astype(np.float32),
        hwf=np.array([h, w, scene.hwf[2]], np.float32),
        near=np.float32(scene.near),
        far=np.float32(scene.far),
    )
    from tgtc.utils import native

    errs = native.wait_writes()
    if errs:
        raise IOError(f"{errs} async png writes failed in {out_dir}")
    return out_dir
