"""Headline benchmark: NeRF render throughput (rays/sec/chip).

Workload parity with the reference's render path: LLFF-fern-shaped frame
(756 x 1008 rays), coarse 64 + fine 128 samples/ray, full-size trunk
(D=8, W=256, viewdirs) — the reference renders this with a chunked PyTorch
loop (`batchify`, /root/reference/utils.py:435; `--chunk 1024` recommended,
/root/reference/README.md:32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline`: the reference publishes no numbers (BASELINE.md) and this
container has no CUDA GPU, so the denominator is a documented estimate of
the reference's single-GPU render throughput: 25,000 rays/s
(756x1008x192-sample coarse+fine frame in ~30 s on a mid-range training
GPU). The driver-defined north star is >=20x (BASELINE.json).
"""

import json
import signal
import sys
import time

import jax
import jax.numpy as jnp

from tgtc.models.nerf import NerfConfig
from tgtc.render.fast import FusedNerfRenderer
from tgtc.render.volume import RenderSettings
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

ASSUMED_REF_RAYS_PER_SEC = 25_000.0

H, W = 756, 1008
BLOCK = 1 << 14  # rays per fused render call


def main():
    nerf_cfg = NerfConfig()  # D=8, W=256, full positional encoding
    train_cfg = NerfTrainConfig(n_samples=64, n_samples_fine=64)
    cm, fm, state = init_state(jax.random.PRNGKey(0), nerf_cfg, train_cfg)
    settings = RenderSettings(n_samples=64, n_samples_fine=64,
                              sigma_noise_std=0.0)
    rend = FusedNerfRenderer.from_params(
        state.params_coarse, state.params_fine, settings
    )

    key = jax.random.PRNGKey(1)
    rays_o = jax.random.uniform(key, (BLOCK, 3), minval=-1.0, maxval=1.0)
    rays_d = jax.random.normal(key, (BLOCK, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # The tunneled TPU platform's block_until_ready is unreliable for
    # chained async dispatches — fold every output into a device scalar and
    # fetch it once so the timing covers ALL enqueued work.
    import numpy as np

    fold = jax.jit(lambda acc, o: acc + jnp.sum(o["rgb"]))

    # warmup / compile
    out = rend.render(rays_o, rays_d)
    acc = fold(jnp.zeros(()), out)
    float(np.asarray(acc))

    n_rays = H * W
    n_blocks = max(1, n_rays // BLOCK)
    reps = 3
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(reps):
        for _ in range(n_blocks):
            out = rend.render(rays_o, rays_d)
            acc = fold(acc, out)
    float(np.asarray(acc))  # hard sync
    dt = time.perf_counter() - t0

    rays_per_sec = reps * n_blocks * BLOCK / dt
    print(
        json.dumps(
            {
                "metric": "nerf_render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
            }
        )
    )


def _watchdog(sig, frame):
    # The tunneled compile service can wedge (see .claude/skills/verify);
    # emit an honest zero rather than hanging the driver.
    print(
        json.dumps(
            {
                "metric": "nerf_render_rays_per_sec_per_chip",
                "value": 0.0,
                "unit": "rays/s",
                "vs_baseline": 0.0,
                "note": "TPU compile service unresponsive (watchdog timeout)",
            }
        )
    )
    sys.stdout.flush()
    raise SystemExit(1)


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(600)
    main()
    signal.alarm(0)
