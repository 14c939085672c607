"""Turntable/video export from render directories.

The reference carries commented-out ``imageio.mimwrite`` mp4 writers
(/root/reference/rendering.py:224-239); this provides the working
equivalent without an ffmpeg dependency: animated GIF via PIL, or an mp4
if imageio+ffmpeg happen to be available.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional


def _frames_in(render_dir: str, pattern: str) -> List[str]:
    rx = re.compile(pattern)
    return sorted(
        os.path.join(render_dir, f)
        for f in os.listdir(render_dir)
        if rx.fullmatch(f)
    )


def write_video(
    render_dir: str,
    out_path: Optional[str] = None,
    pattern: str = r"style_\d{5}_fine_\d{5}\.png",
    fps: int = 30,
) -> str:
    """Assemble the frames matching ``pattern`` into an animation.

    ``out_path`` extension picks the writer (.gif always works; .mp4 only
    with imageio-ffmpeg present). Returns the written path."""
    from PIL import Image

    frames = _frames_in(render_dir, pattern)
    if not frames:
        raise FileNotFoundError(f"no frames matching {pattern} in {render_dir}")
    out_path = out_path or os.path.join(render_dir, "video.gif")

    if out_path.endswith(".mp4"):
        try:
            import imageio.v2 as imageio
            import numpy as np

            imageio.mimwrite(
                out_path,
                [np.asarray(Image.open(f).convert("RGB")) for f in frames],
                fps=fps, quality=8,
            )
            return out_path
        except Exception:
            out_path = out_path[:-4] + ".gif"

    imgs = [Image.open(f).convert("RGB") for f in frames]
    imgs[0].save(
        out_path, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    return out_path
