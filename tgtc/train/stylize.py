"""Phase C3 — bulk stylization + style-feature extraction.

Rebuild of ``transformer_render`` (/root/reference/trans_test.py:55-179):
stylize every NeRF render with the style image at full resolution, save
``NNN.jpg`` (1-indexed), accumulate the per-frame 1024-d feature
([token-mean ‖ token-var] of the 512-d stylized token map), average over
frames, and write ``stylized_data.npz`` with the style registry.

TPU-native: one jitted stylize function over padded-to-multiple-of-8 frames;
JPEG encode on host overlaps the next frame's compute.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.stytrans import StyTrans, style_feature_from_tokens


def _pad_to_multiple(img: jnp.ndarray, m: int = 8) -> jnp.ndarray:
    h, w = img.shape[1], img.shape[2]
    ph, pw = (-h) % m, (-w) % m
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return img


def _stylize_one_style(
    model: StyTrans,
    params,
    content_dir: str,
    style_image: np.ndarray,      # [H, W, 3] float32 in [0,1]
    out_dir: str,
) -> np.ndarray:
    """Stylize all ``rgb_*.png`` frames in ``content_dir`` → ``out_dir``
    (1-indexed ``NNN.jpg``); returns the per-style 1024-d feature."""
    from pathlib import Path

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    frames = sorted(Path(content_dir).glob("rgb_*.png"))
    assert frames, f"no rgb_*.png in {content_dir}"

    stylize = jax.jit(
        lambda p, c, s: model.apply(p, c, s, method=model.stylize)
    )

    feats: List[np.ndarray] = []
    style_p = None
    for i, f in enumerate(frames):
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        h, w = img.shape[:2]
        if style_p is None:
            # the reference resizes the style image to the CONTENT size so
            # both share one token grid (/root/reference/trans_test.py:159-161)
            s_im = Image.fromarray(
                (np.clip(style_image, 0, 1) * 255).astype(np.uint8)
            ).resize((w, h), Image.BILINEAR)
            style_p = _pad_to_multiple(
                jnp.asarray(np.asarray(s_im, np.float32) / 255.0)[None]
            )
        content = _pad_to_multiple(jnp.asarray(img)[None])
        ics, hs = stylize(params, content, style_p)
        out = np.clip(np.asarray(ics[0, :h, :w]), 0.0, 1.0)
        # 1-indexed jpgs (reference naming, /root/reference/dataset.py:482)
        Image.fromarray((out * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{i + 1:03d}.jpg")
        )
        feats.append(np.asarray(style_feature_from_tokens(hs))[0])

    return np.mean(np.stack(feats, 0), axis=0)  # [1024]


def stylize_directory(
    model: StyTrans,
    params,
    content_dir: str,
    style_image: np.ndarray,
    style_name: str,
    out_dir: str,
    batch: int = 1,
) -> Dict[str, np.ndarray]:
    """Single-style convenience wrapper (see :func:`stylize_all`)."""
    return stylize_all(model, params, content_dir, [style_image],
                       [style_name], out_dir)


def stylize_all(
    model: StyTrans,
    params,
    content_dir: str,
    style_images: List[np.ndarray],
    style_names: List[str],
    out_dir: str,
) -> Dict[str, np.ndarray]:
    """Phase C3 over ALL style images (the reference only ever emits one
    style — /root/reference/trans_test.py:141-144 — but its Phase-E dataset
    carries a full [S, F] style axis; this populates it).

    Layout: S==1 keeps the reference's flat ``NNN.jpg`` layout; S>1 writes
    per-style subdirs ``style_{s:02d}/NNN.jpg`` recorded in the npz's
    ``style_paths`` (the field the reference reader indexes,
    /root/reference/dataset.py:467-482).
    """
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    feats, dirs = [], []
    s_count = len(style_images)
    for s, img in enumerate(style_images):
        sub = out_dir if s_count == 1 else os.path.join(
            out_dir, f"style_{s:02d}")
        feats.append(_stylize_one_style(model, params, content_dir, img, sub))
        dirs.append(sub)
    style_feature = np.stack(feats, 0).astype(np.float32)  # [S, 1024]
    thumbs = np.stack([
        np.asarray(
            Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8))
            .resize((256, 256), Image.BILINEAR), np.float32) / 255.0
        for im in style_images
    ], 0)
    np.savez(
        os.path.join(out_dir, "stylized_data.npz"),
        style_names={n: i for i, n in enumerate(style_names)},
        style_paths=np.array(dirs),
        style_images=thumbs,
        style_features=style_feature,
    )
    return {"style_features": style_feature}
