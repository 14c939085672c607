"""End-to-end Phase-F benchmark: stylized frames/min at 1008x756 INCLUDING
host assembly + PNG/depth IO (the number the round-2 VERDICT flagged at
~8/min vs the 19.6/min pure-compute bench).

    python perf/bench_phase_f.py [--frames N] [--styles S]

Drives tgtc.train.render_style.render_stylized_frames_fused — the same
code path the pipeline's --render_valid_style uses — with random weights
(throughput is value-independent) on the real TPU, writing real PNGs.
Reference analog: /root/reference/rendering.py:93-239.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig
from tgtc.render.fast_style import FusedStyleRenderer
from tgtc.render.volume import RenderSettings
from tgtc.train.render_style import render_stylized_frames_fused

H, W = 756, 1008


def build_params(styles: int, frames: int):
    """Init on the in-process CPU backend (local compiles, no tunnel)."""
    from tgtc.models.style_field import (
        StyleFieldConfig, init_latents, make_style_mlps,
    )
    from tgtc.models.nerf import make_nerf

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        k = jax.random.PRNGKey(0)
        _, pc = make_nerf(NerfConfig(), k)
        _, pf = make_nerf(NerfConfig(), jax.random.fold_in(k, 1))
        _, cparams, _, sparams = make_style_mlps(
            StyleFieldConfig(), jax.random.fold_in(k, 2)
        )
        lat = init_latents(jax.random.fold_in(k, 3), styles, frames, 32)
    dev = jax.devices()[0]
    return jax.device_put((pc, pf, cparams, sparams, lat), dev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--styles", type=int, default=2)
    ap.add_argument("--fine_budget", type=int, default=0,
                    help="opt-in ERT (0 = exact)")
    ap.add_argument("--coarse_share", type=int, default=1,
                    help="shared coarse proposal group size (1 = exact)")
    ap.add_argument("--depth_png", default="full",
                    choices=["full", "half", "off"],
                    help="per-frame depth artifact; 'half'/'off' shrink "
                         "the per-frame D2H fetch (the wall bottleneck on "
                         "a tunneled host)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    pc, pf, cparams, sparams, lat = build_params(args.styles, args.frames)
    settings = RenderSettings(n_samples=64, n_samples_fine=64,
                              sigma_noise_std=0.0)
    rend = FusedStyleRenderer.from_params(
        pc, pf, cparams, sparams, lat, settings,
        coarse_rgb=False,  # production Phase-F path: sigma-only coarse
        fine_budget=args.fine_budget or None,
        coarse_share=args.coarse_share,
    )
    print(f"[phase_f] params ready at +{time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    rd = rng.standard_normal((args.frames, H, W, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = rng.uniform(-1, 1, (args.frames, H, W, 3)).astype(np.float32)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)

    out = tempfile.mkdtemp(prefix="tgtc_phase_f_")
    try:
        # warmup: one frame (kernel + finalize compile)
        render_stylized_frames_fused(rend, ro[:1], rd[:1], [0], out,
                                     jax.random.PRNGKey(9),
                                     depth_png=args.depth_png)
        print(f"[phase_f] warmup done at +{time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        shutil.rmtree(out)
        os.makedirs(out)

        t1 = time.perf_counter()
        n = render_stylized_frames_fused(
            rend, ro, rd, range(args.styles), out, jax.random.PRNGKey(9),
            depth_png=args.depth_png,
        )
        dt = time.perf_counter() - t1
        written = len(os.listdir(out))
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # per-frame device->host fetch budget: rgb8 always; depth uint8 at
    # full/quarter/zero area — THE wall-clock lever on a ~2 MB/s tunnel
    rgb_bytes = H * W * 3
    depth_bytes = {"full": H * W, "half": (H // 2) * (W // 2), "off": 0}[
        args.depth_png]
    print(json.dumps({
        "metric": "stylized_frames_per_min_e2e",
        "value": round(n / dt * 60.0, 2),
        "unit": "frames/min",
        "frames": n,
        "pngs_written": written,
        "seconds": round(dt, 2),
        "fine_budget": args.fine_budget,
        "coarse_share": args.coarse_share,
        "depth_png": args.depth_png,
        "d2h_bytes_per_frame": rgb_bytes + depth_bytes,
        "d2h_rgb_bytes": rgb_bytes,
        "d2h_depth_bytes": depth_bytes,
    }))


if __name__ == "__main__":
    main()
