"""Phase-E dataset: device-resident stylized-scene tensors + batch gathers.

Replaces ``StyleRaySampler_gen`` + ``LightDataLoader``
(/root/reference/dataset.py:361-639,641-779), whose per-ray
``__getitem__`` numpy indexing is a host bottleneck. Here every tensor
(NeRF renders, stylized images per (style, frame), precomputed rays, style
features) lives in HBM once; batches are pure gathers inside the jitted
train step.

Two streams (SURVEY.md §3.4):

* **main** — uniform-random rays over (style, frame, pixel).
* **coherent** — the same pixel block revisited across consecutive frames
  (the mechanism behind the cross-view coherence loss,
  /root/reference/dataset.py:734-779). The reference walks a shuffled
  permutation block by block; we draw the pixel block from a counter-keyed
  PRNG instead — the same distribution without storing a permutation.

Counters follow the reference update rule: frame advances every batch;
when a frame cycle completes the pixel block advances; when the pixel space
is exhausted the style advances.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tgtc.data.llff import LlffScene
from tgtc.data.rays import rays_for_poses


class StyleSceneData(struct.PyTreeNode):
    """Device-resident Phase-E tensors (a pytree — passes straight into
    jitted steps)."""

    rays_o: jnp.ndarray          # [F, H, W, 3]
    rays_d: jnp.ndarray          # [F, H, W, 3]
    images: jnp.ndarray          # [F, H, W, 3]  NeRF renders (rgb_origin)
    stylized: jnp.ndarray        # [S, F, H, W, 3] float32
    style_features: jnp.ndarray  # [S, 1024]
    near: float = struct.field(pytree_node=False, default=0.0)
    far: float = struct.field(pytree_node=False, default=1.0)

    @property
    def style_num(self) -> int:
        return self.stylized.shape[0]

    @property
    def frame_num(self) -> int:
        return self.stylized.shape[1]

    @property
    def hw(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]


def load_style_scene(
    scene: LlffScene,
    gen_dir: str,
    stylized_dir: str,
    use_ndc: bool = True,
    pixel_alignment: bool = False,
) -> StyleSceneData:
    """Assemble Phase-E tensors from Phase-B renders (``gen_dir``) and
    Phase-C stylized outputs (``stylized_dir`` with ``%03d.jpg`` frames and
    ``stylized_data.npz``)."""
    from PIL import Image

    h, w, _ = scene.hwf
    rgb_paths = sorted(Path(gen_dir).glob("rgb_*.png"))
    images = np.stack(
        [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
         for p in rgb_paths], 0,
    )
    f = images.shape[0]

    npz = np.load(os.path.join(stylized_dir, "stylized_data.npz"),
                  allow_pickle=True)
    style_features = np.asarray(npz["style_features"], np.float32)
    s = style_features.shape[0]
    # per-style frame dirs come from the npz's style_paths (the field the
    # reference reader indexes, /root/reference/dataset.py:467-482); fall
    # back to the flat layout for foreign/reference-produced npz files
    # whose recorded paths don't exist on this machine
    style_dirs = [str(p) for p in npz["style_paths"]] if "style_paths" in npz \
        else [stylized_dir] * s
    missing = [d for d in style_dirs if not os.path.isdir(d)]
    if missing:
        print(f"[style_dataset] WARNING: {len(missing)} recorded style dir(s) "
              f"missing on this machine (e.g. {missing[0]}); falling back to "
              f"{stylized_dir}", flush=True)
    style_dirs = [d if os.path.isdir(d) else stylized_dir
                  for d in style_dirs]
    if len(style_dirs) < s:
        style_dirs = style_dirs + [stylized_dir] * (s - len(style_dirs))
    if s > 1 and len(set(style_dirs)) == 1 and missing:
        # every style collapsed to the same fallback dir: all S styles
        # would silently load IDENTICAL stylized frames while
        # style_features still differ per style — training garbage
        raise FileNotFoundError(
            f"all {s} styles' recorded frame dirs are missing and collapse "
            f"to the single fallback {stylized_dir}; restore the per-style "
            f"dirs recorded in stylized_data.npz (style_paths) or re-run "
            f"Phase C3"
        )
    stylized = np.zeros((s, f, h, w, 3), np.float32)
    for si in range(s):
        for j in range(f):
            # frame files are 1-indexed (/root/reference/dataset.py:482)
            img = np.asarray(
                Image.open(os.path.join(style_dirs[si], f"{j + 1:03d}.jpg"))
                .convert("RGB"), np.float32,
            ) / 255.0
            stylized[si, j] = img

    ro, rd = rays_for_poses(
        h, w, jnp.asarray(scene.intrinsics), jnp.asarray(scene.poses),
        use_ndc=use_ndc, pixel_alignment=pixel_alignment,
    )
    return StyleSceneData(
        rays_o=ro, rays_d=rd,
        images=jnp.asarray(images),
        stylized=jnp.asarray(stylized),
        style_features=jnp.asarray(style_features),
        near=scene.near, far=scene.far,
    )


def synthetic_style_scene(key: jax.Array, s: int, f: int, h: int, w: int
                          ) -> StyleSceneData:
    """Random tiny instance for tests."""
    ks = jax.random.split(key, 5)
    return StyleSceneData(
        rays_o=jax.random.uniform(ks[0], (f, h, w, 3)) - 0.5,
        rays_d=jax.random.normal(ks[1], (f, h, w, 3)),
        images=jax.random.uniform(ks[2], (f, h, w, 3)),
        stylized=jax.random.uniform(ks[3], (s, f, h, w, 3)),
        style_features=jax.random.normal(ks[4], (s, 1024)),
        near=0.0, far=1.0,
    )


def gather_main_batch(data: StyleSceneData, key: jax.Array, batch: int
                      ) -> Dict[str, jnp.ndarray]:
    """Uniform-random main stream (inside jit)."""
    s, f = data.style_num, data.frame_num
    h, w = data.hw
    idx = jax.random.randint(key, (batch,), 0, s * f * h * w)
    style_id = idx // (f * h * w)
    rem = idx % (f * h * w)
    frame_id = rem // (h * w)
    hid = (rem % (h * w)) // w
    wid = rem % w
    return {
        "rays_o": data.rays_o[frame_id, hid, wid],
        "rays_d": data.rays_d[frame_id, hid, wid],
        "rgb_gt": data.stylized[style_id, frame_id, hid, wid],
        "rgb_origin": data.images[frame_id, hid, wid],
        "style_id": style_id,
        "frame_id": frame_id,
    }


def gather_coh_batch(
    data: StyleSceneData,
    base_key: jax.Array,
    style_start: jnp.ndarray,
    frame_start: jnp.ndarray,
    block: jnp.ndarray,
    batch: int,
) -> Dict[str, jnp.ndarray]:
    """Coherent stream: pixel ids keyed on (style_start, block) so the SAME
    pixels recur for every frame of one cycle (inside jit)."""
    h, w = data.hw
    pix_key = jax.random.fold_in(
        jax.random.fold_in(base_key, style_start), block
    )
    pix = jax.random.randint(pix_key, (batch,), 0, h * w)
    hid, wid = pix // w, pix % w
    frame_id = jnp.broadcast_to(frame_start, (batch,))
    style_id = jnp.broadcast_to(style_start, (batch,))
    return {
        "rays_o": data.rays_o[frame_id, hid, wid],
        "rays_d": data.rays_d[frame_id, hid, wid],
        "rgb_gt": data.stylized[style_id, frame_id, hid, wid],
        "rgb_origin": data.images[frame_id, hid, wid],
        "style_id": style_id,
        "frame_id": frame_id,
    }


def nearby_camera_batch(
    cps: np.ndarray, batch: int, rng: np.random.Generator,
    factor: float = 0.01,
) -> np.ndarray:
    """Indices of ``batch`` cameras near a random anchor, sampled by inverse
    pose distance (the reference's ``CoorImageDataset_pl`` nearby-camera
    batching, /root/reference/train_style_modules.py:124-177)."""
    n = cps.shape[0]
    anchor = int(rng.integers(n))
    d = np.linalg.norm(cps[:, :3, 3] - cps[anchor, :3, 3], axis=-1)
    p = 1.0 / (d + factor)
    p[anchor] = p.max()
    p = p / p.sum()
    rest = rng.choice(n, size=batch - 1, replace=batch - 1 > n - 1, p=p)
    return np.concatenate([[anchor], rest])


def gather_patch_batch(
    data: StyleSceneData,
    style_id: jnp.ndarray,
    frame_id: jnp.ndarray,
    hid: jnp.ndarray,
    wid: jnp.ndarray,
    patch: int,
) -> Dict[str, jnp.ndarray]:
    """A square patch of rays centered near (hid, wid), clamped in-bounds
    (parity with ``get_patch_train_style``,
    /root/reference/dataset.py:591-615) — flattened row-major like the
    reference's ``.T`` index layout. Jit-friendly (dynamic_slice)."""
    h, w = data.hw
    y0 = jnp.clip(hid - patch // 2, 0, h - patch)
    x0 = jnp.clip(wid - patch // 2, 0, w - patch)

    def crop(arr4):  # [F/H/W/C] indexed at frame_id
        a = arr4[frame_id]
        return jax.lax.dynamic_slice(
            a, (y0, x0, 0), (patch, patch, a.shape[-1])
        ).reshape(patch * patch, -1)

    out = {
        "rays_o": crop(data.rays_o),
        "rays_d": crop(data.rays_d),
        "rgb_origin": crop(data.images),
        "rgb_gt": jax.lax.dynamic_slice(
            data.stylized[style_id, frame_id], (y0, x0, 0),
            (patch, patch, 3),
        ).reshape(patch * patch, 3),
        "style_id": jnp.broadcast_to(style_id, (patch * patch,)),
        "frame_id": jnp.broadcast_to(frame_id, (patch * patch,)),
    }
    return out


def advance_coh_counters(
    style_start: jnp.ndarray,
    frame_start: jnp.ndarray,
    block: jnp.ndarray,
    start: jnp.ndarray,
    style_num: int,
    frame_num: int,
    batch: int,
    hw: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The reference's counter-advance rule
    (/root/reference/dataset.py:761-768)."""
    next_style = (
        (frame_start == frame_num - 1)
        & (style_start != style_num - 1)
        & (start >= hw)
    )
    advance_frame = frame_start != frame_num - 1
    new_style = jnp.where(next_style, style_start + 1, style_start)
    new_frame = jnp.where(
        next_style, 0, jnp.where(advance_frame, frame_start + 1, 0)
    )
    wrap = (~next_style) & (~advance_frame)
    new_start = jnp.where(next_style, 0,
                          jnp.where(wrap, start + batch, start))
    new_block = jnp.where(next_style, 0, jnp.where(wrap, block + 1, block))
    return new_style, new_frame, new_block, new_start
