"""Frame-agreement PSNR between two spiral artifact directories.

Used to validate that an approximate render mode (e.g. ``--fine_budget``
early ray termination) produces frames indistinguishable from the exact
path: compare the rgb PNGs of two `render_valid_style` runs pairwise.

Round-4 measurement (exact vs fine_budget=80, 240 frames @ 756x1008):
mean 52.05 dB, min 50.78 dB, p5 50.97 dB — visually identical
(recorded in BASELINE.md, "ERT on the stylized spiral").

Usage: python perf/compare_spirals.py DIR_A DIR_B
"""
import os
import sys

import numpy as np
from PIL import Image


def compare(dir_a: str, dir_b: str):
    names = sorted(
        f for f in os.listdir(dir_a)
        if f.endswith(".png") and "depth" not in f
    )
    if not names:
        raise SystemExit(f"no rgb frames in {dir_a}")
    psnrs = []
    for f in names:
        a = np.asarray(Image.open(os.path.join(dir_a, f)), np.float32)
        b = np.asarray(Image.open(os.path.join(dir_b, f)), np.float32)
        mse = np.mean((a - b) ** 2)
        psnrs.append(-10 * np.log10(mse / 255.0 ** 2 + 1e-12))
    return np.array(psnrs)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    p = compare(sys.argv[1], sys.argv[2])
    print(f"frames={len(p)} mean={p.mean():.2f} dB min={p.min():.2f} dB "
          f"p5={np.percentile(p, 5):.2f} dB")
