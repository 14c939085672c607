"""Secondary benchmark: stylized novel-view throughput (frames/min).

BASELINE.md's second headline metric — full transformer-guided stylized
render at LLFF fern resolution (756 x 1008, 64+128 samples) through the
fused style kernel. Prints one JSON line.

    python perf/bench_stylized.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig
from tgtc.models.style_field import StyleFieldConfig, init_latents, make_style_mlps
from tgtc.render.fast_style import FusedStyleRenderer
from tgtc.render.volume import RenderSettings
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

H, W = 756, 1008
BLOCK = 16384


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse_rgb", action="store_true",
                    help="run the full style chain on the coarse pass "
                         "(pre-round-3 behavior); default is the "
                         "production sigma-only coarse")
    ap.add_argument("--frames_per_dispatch", type=int, default=1,
                    help="tape N frames' rays through one contiguous block "
                         "stream (the kernel is (s,f)-indexed per ray, so "
                         "frames can share a launch); amortizes the "
                         "per-frame tail-block padding — VERDICT r2 "
                         "item 9's experiment")
    ap.add_argument("--fine_budget", type=int, default=0,
                    help="early ray termination: fine style chain on only "
                         "the top-N merged samples per ray (0 = off; see "
                         "ops.sampling.select_sample_budget)")
    ap.add_argument("--coarse_share", type=int, default=1,
                    help="shared coarse proposal: run the sigma-only "
                         "coarse pass on every N-th ray and share its "
                         "depth set across N scanline-adjacent pixels "
                         "(render.fast_style coarse_share; 1 = off)")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()
    _, _, state = init_state(key, nerf_cfg, NerfTrainConfig())
    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    _, pcat, _, psty = make_style_mlps(field, jax.random.fold_in(key, 1))
    lat = init_latents(jax.random.fold_in(key, 2), 1, 20, 32)
    rend = FusedStyleRenderer.from_params(
        state.params_coarse, state.params_fine, pcat, psty, lat,
        RenderSettings(n_samples=64, n_samples_fine=64, sigma_noise_std=0.0),
        coarse_rgb=args.coarse_rgb,
        fine_budget=args.fine_budget or None,
        coarse_share=args.coarse_share,
    )

    ro = jax.random.uniform(key, (BLOCK, 3), minval=-1, maxval=1)
    rd = jax.random.normal(key, (BLOCK, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    sid = jnp.zeros((BLOCK,), jnp.int32)
    fid = jnp.zeros((BLOCK,), jnp.int32)

    fold = jax.jit(lambda acc, o: acc + jnp.sum(o["rgb"]))
    out = rend.render(ro, rd, sid, fid, key)
    acc = fold(jnp.zeros(()), out)
    float(np.asarray(acc))  # compile + sync

    # frames_per_dispatch=N tapes N frames through one contiguous ray
    # stream: blocks = ceil(N*H*W / BLOCK) instead of N * ceil(H*W / BLOCK),
    # so only the tape's LAST block pads (per-frame padding amortizes away).
    fpd = args.frames_per_dispatch
    blocks_per_tape = -(-fpd * H * W // BLOCK)
    reps = max(1, 2 // fpd)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for r in range(reps):
        for b in range(blocks_per_tape):
            out = rend.render(ro, rd, sid, fid, jax.random.fold_in(key, b))
            acc = fold(acc, out)
    float(np.asarray(acc))
    dt = time.perf_counter() - t0

    frames_per_min = 60.0 * reps * fpd / dt
    print(json.dumps({
        "metric": "stylized_frames_per_min_1008x756",
        "value": round(frames_per_min, 2),
        "unit": "frames/min",
        "rays_per_sec": round(reps * blocks_per_tape * BLOCK / dt, 1),
        "coarse_rgb": args.coarse_rgb,
        "frames_per_dispatch": fpd,
        "fine_budget": args.fine_budget,
        "coarse_share": args.coarse_share,
    }))


if __name__ == "__main__":
    main()
