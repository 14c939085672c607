"""Render block-size sweep: rays/s vs rays-per-dispatch for the fused
pipeline (per-dispatch tunnel overhead amortization).

    python perf/block_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig
from tgtc.render.fast import FusedNerfRenderer
from tgtc.render.volume import RenderSettings
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state


def main():
    nerf_cfg = NerfConfig()
    cm, fm, state = init_state(jax.random.PRNGKey(0), nerf_cfg,
                               NerfTrainConfig())
    settings = RenderSettings(n_samples=64, n_samples_fine=64,
                              sigma_noise_std=0.0)
    rend = FusedNerfRenderer.from_params(
        state.params_coarse, state.params_fine, settings
    )
    key = jax.random.PRNGKey(1)
    fold = jax.jit(lambda acc, o: acc + jnp.sum(o["rgb"]))
    total = 1 << 20  # rays per measurement
    for block in (8192, 16384, 32768, 65536):
        ro = jax.random.uniform(key, (block, 3), minval=-1, maxval=1)
        rd = jax.random.normal(key, (block, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        acc = fold(jnp.zeros(()), rend.render(ro, rd))
        float(np.asarray(acc))  # compile + sync
        n = max(1, total // block)
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            acc = fold(acc, rend.render(ro, rd))
        float(np.asarray(acc))
        dt = time.perf_counter() - t0
        print(f"block {block:6d}: {n * block / dt:10,.0f} rays/s "
              f"({dt / n * 1e3:6.1f} ms/call)")


if __name__ == "__main__":
    main()
