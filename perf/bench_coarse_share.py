"""Throughput of the shared-coarse-proposal render variants (render.fast
``coarse_share``) on the live chip, same protocol/workload as bench.py
(756x1008 frame, 64c+128f merged samples, D8/W256 trunk, sigma-only
coarse). Quality deltas for these points are measured separately by
perf/validate_realscale.py --ert_sweep '80x2,...' on a trained scene.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from bench import (  # noqa: E402  (enables the compilation cache on import)
    ASSUMED_REF_RAYS_PER_SEC,
    BLOCK,
    H,
    W,
    _numpy_nerf_params,
)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tgtc.models.nerf import NerfConfig
    from tgtc.render.fast import FusedNerfRenderer
    from tgtc.render.volume import RenderSettings

    jax.devices()
    rng = np.random.default_rng(0)
    cfg = NerfConfig()
    params_c = _numpy_nerf_params(rng, cfg)
    params_f = _numpy_nerf_params(rng, cfg)
    settings = RenderSettings(n_samples=64, n_samples_fine=64,
                              sigma_noise_std=0.0)

    rays_o = rng.uniform(-1.0, 1.0, (BLOCK, 3)).astype(np.float32)
    rays_d = rng.standard_normal((BLOCK, 3)).astype(np.float32)
    rays_d = jnp.asarray(
        rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True))
    rays_o = jnp.asarray(rays_o)
    fold = jax.jit(lambda acc, o: acc + jnp.sum(o["rgb"]))

    def measure(fine_budget, coarse_share, reps=3):
        rend = FusedNerfRenderer.from_params(
            params_c, params_f, settings, coarse_rgb=False,
            fine_budget=fine_budget, coarse_share=coarse_share)
        n_blocks = max(1, H * W // BLOCK)
        out = rend.render(rays_o, rays_d)
        float(np.asarray(fold(jnp.zeros(()), out)))  # compile+warm
        a = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(reps):
            for _ in range(n_blocks):
                a = fold(a, rend.render(rays_o, rays_d))
        float(np.asarray(a))
        return reps * n_blocks * BLOCK / (time.perf_counter() - t0)

    for budget, share in [(None, 1), (None, 2), (None, 4),
                          (80, 1), (80, 2), (80, 4)]:
        r = measure(budget, share)
        print(json.dumps({
            "fine_budget": budget or 0, "coarse_share": share,
            "rays_per_sec": round(r, 1),
            "vs_baseline": round(r / ASSUMED_REF_RAYS_PER_SEC, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
