"""Training-step throughput benchmark: Phase-A steps/s (reference schedule:
120k steps x 2048 rays x 64+128 samples, /root/reference/configs/fern.txt).

    python perf/bench_train.py [--feature_major]

Prints one JSON line with steps/s and rays/s for the full train step
(sampling + coarse/fine forward + backward + Adam), point-major and
feature-major trunk layouts.
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
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state, make_train_step


def measure(feature_major: bool, n_steps: int = 30) -> float:
    cfg = NerfTrainConfig(batch_size=2048, n_samples=64, n_samples_fine=64,
                          feature_major=feature_major)
    cm, fm, state = init_state(jax.random.PRNGKey(0), NerfConfig(), cfg)
    key = jax.random.PRNGKey(1)
    n = 1 << 20
    ro = jax.random.uniform(key, (n, 3))
    rd = jax.random.normal(key, (n, 3))
    rgb = jax.random.uniform(key, (n, 3))
    step = make_train_step(cm, fm, cfg)

    state, m = step(state, ro, rd, rgb, key)
    float(np.asarray(m["loss"]))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, ro, rd, rgb, key)
    float(np.asarray(m["loss"]))  # fold-free: metrics fetch syncs the chain
    return n_steps / (time.perf_counter() - t0)


def measure_fused(n_steps: int = 30) -> float:
    from tgtc.train.nerf_trainer import make_fused_train_step

    cfg = NerfTrainConfig(batch_size=2048, n_samples=64, n_samples_fine=64)
    ncfg = NerfConfig()
    cm, fm, state = init_state(jax.random.PRNGKey(0), ncfg, cfg)
    key = jax.random.PRNGKey(1)
    n = 1 << 20
    ro = jax.random.uniform(key, (n, 3))
    rd = jax.random.normal(key, (n, 3))
    rgb = jax.random.uniform(key, (n, 3))
    step = make_fused_train_step(ncfg, cfg, tile=1024)
    state, m = step(state, ro, rd, rgb, key)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, ro, rd, rgb, key)
    float(np.asarray(m["loss"]))
    return n_steps / (time.perf_counter() - t0)


def measure_fused_scan(k: int = 50, n_chunks: int = 8) -> float:
    """The production Phase-A dispatch: K steps per launch via lax.scan
    (pipeline.ensure_nerf), fused custom-VJP trunk."""
    from tgtc.train.nerf_trainer import make_fused_train_step

    cfg = NerfTrainConfig(batch_size=2048, n_samples=64, n_samples_fine=64)
    ncfg = NerfConfig()
    cm, fm, state = init_state(jax.random.PRNGKey(0), ncfg, cfg)
    key = jax.random.PRNGKey(1)
    n = 1 << 20
    ro = jax.random.uniform(key, (n, 3))
    rd = jax.random.normal(key, (n, 3))
    rgb = jax.random.uniform(key, (n, 3))
    chunk = make_fused_train_step(ncfg, cfg, tile=1024, k_steps=k)
    state, ms = chunk(state, ro, rd, rgb, key)
    float(np.asarray(ms["loss"][-1]))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, ms = chunk(state, ro, rd, rgb, key)
    float(np.asarray(ms["loss"][-1]))
    return n_chunks * k / (time.perf_counter() - t0)


def main():
    pm = measure(False)
    fmj = measure(True)
    fused = measure_fused()
    fused_scan = measure_fused_scan()
    print(json.dumps({
        "metric": "nerf_train_steps_per_sec",
        "point_major": round(pm, 2),
        "feature_major": round(fmj, 2),
        "fused_custom_vjp": round(fused, 2),
        "fused_k50_scan": round(fused_scan, 2),
        "rays_per_sec_best": round(
            max(pm, fmj, fused, fused_scan) * 2048, 1),
    }))


if __name__ == "__main__":
    main()
