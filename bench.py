"""Headline benchmark: NeRF render throughput (rays/sec/chip).

Workload parity with the reference's render path: LLFF-fern-shaped frame
(756 x 1008 rays), coarse 64 + fine 64 samples/ray (the fine MLP evaluates
the merged 128 samples, /root/reference/configs/fern.txt:16-17), full-size trunk
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


def _enable_compilation_cache() -> None:
    """Same persistent XLA compilation cache the CLI enables
    (tgtc/cli.py). The bench child pays a ~40 s cold compile without it;
    with the on-disk cache (pre-warmed during the round) a fresh process
    compiles from disk in seconds — which is what lets the driver's
    watchdogged run finish even when the remote compile service is slow."""
    import os

    if os.environ.get("TGTC_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "TGTC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tgtc_jax"),
    )
    try:
        import jax as _jax

        os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[cache] compilation cache disabled: {e}", flush=True)


_enable_compilation_cache()

import jax
import jax.numpy as jnp

from tgtc.models.nerf import NerfConfig
from tgtc.render.fast import FusedNerfRenderer
from tgtc.render.volume import RenderSettings

ASSUMED_REF_RAYS_PER_SEC = 25_000.0

# TPU v5e peak bf16 matmul throughput (public spec). The round-3 kernel
# lab's "practical max" (119.5, a tunnel-measured fat matmul) is NOT used
# as the denominator: the fused render itself sustains more than that
# (125.3 TFLOP/s measured round-4), proving that measurement pessimistic.
PEAK_TFLOPS_BF16 = 197.0

H, W = 756, 1008
BLOCK = 1 << 14  # rays per fused render call
# early-ray-termination variant: fine MLP on the top 80/128 samples —
# the quality-validated production point: holdout GT-PSNR delta -0.01 dB
# at 20k AND 100k training steps on the realscale scene (BASELINE.md
# round 4; budget 64 measures +2-4 dB there and is NOT the default)
ERT_FINE_BUDGET = 80
# shared-coarse-proposal variant stacked on ERT: the coarse sigma pass
# (the largest stage at ERT-80) runs on one ray per COARSE_SHARE
# scanline-adjacent pixels and its resampled/selected depth set is shared
# within the group (render.fast coarse_share). Share 2 is the validated
# point: holdout GT-PSNR delta -0.010 dB at 100k steps, same band as
# ERT-80 alone; share 4 measures +0.09-0.11 dB there and is NOT the
# default (BASELINE.md "Shared coarse proposal")
COARSE_SHARE = 2
# density-grid proposal snapshot resolution (tgtc.render.grid): 192^3
# float32 = 28 MB HBM; quality sweep in BASELINE.md round 5
GRID_RES = 192
# distilled-proposal trunk dims (tgtc.render.distill): width 128 fills one
# MXU lane tile; quality sweep in BASELINE.md round 5
PROPOSAL_DEPTH = 2
PROPOSAL_WIDTH = 128


def _flops_per_ray(nc=64, nf_tot=128, fine_budget=None):
    """Analytic MXU FLOPs/ray for the sigma-only-coarse + full-fine render
    (D=8/W=256, freq 10/4, skip at 4) — matmul FLOPs only, the >99% term."""
    in_pts, in_dir, w = 63, 27, 256
    trunk = 2 * (in_pts * w + 6 * w * w + (w + in_pts) * w)
    sigma = 2 * w * 1
    rgb = 2 * (w * w + (w + in_dir) * (w // 2) + (w // 2) * 3)
    coarse = nc * (trunk + sigma)                      # sigma-only coarse
    fine = (fine_budget or nf_tot) * (trunk + sigma + rgb)
    return coarse + fine


def _numpy_nerf_params(rng, cfg: NerfConfig):
    """Random D8/W256 trunk params built HOST-SIDE (numpy). The bench only
    measures throughput — dense-MLP runtime is value-independent — and
    flax/optax init on the tunneled device costs ~160 s of tiny compiles
    the watchdogged child cannot afford."""
    import numpy as np

    w = cfg.width
    in_pts = 3 * (1 + 2 * cfg.embed_freq_coor)      # 63
    in_dir = 3 * (1 + 2 * cfg.embed_freq_dir)       # 27

    def dense(nin, nout):
        return {
            "kernel": rng.standard_normal((nin, nout), np.float32)
            * np.float32((2.0 / nin) ** 0.5),
            "bias": np.zeros((nout,), np.float32),
        }

    layers = {"base_0": dense(in_pts, w)}
    for i in range(cfg.depth - 1):
        # skip at i re-concats embedded pts into base_{i+1}'s input
        nin = w + in_pts if i in cfg.skips else w
        layers[f"base_{i + 1}"] = dense(nin, w)
    layers["sigma"] = dense(w, 1)
    layers["base_remap"] = dense(w, w)
    layers["rgb_0"] = dense(w + in_dir, w // 2)
    layers["rgb_1"] = dense(w // 2, 3)
    return {"params": layers}


def main():
    import numpy as np

    _t0 = time.perf_counter()

    def _mark(what):  # stderr diagnostics; driver parses stdout JSON only
        print(f"[bench] {what} at +{time.perf_counter() - _t0:.1f}s",
              file=sys.stderr, flush=True)

    jax.devices()  # force backend/tunnel init before timing anything
    _mark("backend up")
    nerf_cfg = NerfConfig()  # D=8, W=256, full positional encoding
    rng = np.random.default_rng(0)
    params_c = _numpy_nerf_params(rng, nerf_cfg)
    params_f = _numpy_nerf_params(rng, nerf_cfg)
    settings = RenderSettings(n_samples=64, n_samples_fine=64,
                              sigma_noise_std=0.0)
    # sigma-only coarse pass: render consumes only the fine image, the
    # coarse pass exists for sample_pdf weights (round-3; bitwise-identical
    # fine output, tests/test_pallas_kernel.py)
    rend = FusedNerfRenderer.from_params(params_c, params_f, settings,
                                         coarse_rgb=False)
    # ERT variant: top-64/128 merged samples by coarse-estimated weight
    # (opt-in --fine_budget; quality delta measured on the realscale scene,
    # BASELINE.md round-4)
    rend_ert = FusedNerfRenderer.from_params(
        params_c, params_f, settings, coarse_rgb=False,
        fine_budget=ERT_FINE_BUDGET)
    # ERT + shared coarse proposal (opt-in --fine_budget + --coarse_share)
    rend_ert_cs = FusedNerfRenderer.from_params(
        params_c, params_f, settings, coarse_rgb=False,
        fine_budget=ERT_FINE_BUDGET, coarse_share=COARSE_SHARE)

    rays_o = rng.uniform(-1.0, 1.0, (BLOCK, 3)).astype(np.float32)
    rays_d = rng.standard_normal((BLOCK, 3)).astype(np.float32)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    # density-grid proposal variant (opt-in --sigma_grid): the coarse MLP
    # is replaced by a trilinear gather from a voxel snapshot of the
    # frozen fine density (tgtc.render.grid; quality in BASELINE.md).
    # Throughput is value-independent, so random voxels stand in here —
    # the GATHER cost is what's being measured.
    from tgtc.render.grid import GridSpec, ray_bounds

    glo, ghi = ray_bounds(rays_o, rays_d, settings.near, settings.far)
    grid_vals = jnp.asarray(
        rng.normal(size=(GRID_RES,) * 3).astype(np.float32))
    rend_grid = FusedNerfRenderer.from_params(
        params_c, params_f, settings, coarse_rgb=False,
        fine_budget=ERT_FINE_BUDGET, coarse_share=COARSE_SHARE,
        sigma_grid=(grid_vals, GridSpec(lo=glo, hi=ghi)))

    # distilled-proposal variant (opt-in --proposal_width): the D8xW256
    # coarse pass is replaced by a tiny MXU-shaped trunk regressed onto
    # the frozen fine density (tgtc.render.distill; quality in
    # BASELINE.md). Throughput is value-independent — random tiny params
    # stand in; what's measured is the DnxWn sigma pass.
    params_p = _numpy_nerf_params(
        rng, NerfConfig(depth=PROPOSAL_DEPTH, width=PROPOSAL_WIDTH))
    rend_prop = FusedNerfRenderer.from_params(
        params_p, params_f, settings, coarse_rgb=False,
        depth=PROPOSAL_DEPTH, width=PROPOSAL_WIDTH,
        depth_fine=nerf_cfg.depth, width_fine=nerf_cfg.width,
        fine_budget=ERT_FINE_BUDGET, coarse_share=COARSE_SHARE)

    rays_d = jnp.asarray(rays_d)
    rays_o = jnp.asarray(rays_o)

    # The tunneled TPU platform's block_until_ready is unreliable for
    # chained async dispatches — fold every output into a device scalar and
    # fetch it once so the timing covers ALL enqueued work.

    fold = jax.jit(lambda acc, o: acc + jnp.sum(o["rgb"]))

    _mark("state built")

    def _measure(renderer, reps=3):
        n_rays = H * W
        n_blocks = max(1, n_rays // BLOCK)
        # warmup / compile
        out = renderer.render(rays_o, rays_d)
        a = fold(jnp.zeros(()), out)
        float(np.asarray(a))
        a = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(reps):
            for _ in range(n_blocks):
                out = renderer.render(rays_o, rays_d)
                a = fold(a, out)
        float(np.asarray(a))  # hard sync
        return reps * n_blocks * BLOCK / (time.perf_counter() - t0)

    rays_per_sec = _measure(rend)
    _mark("exact path measured")
    ert_rays_per_sec = _measure(rend_ert)
    _mark("ERT path measured")
    ert_cs_rays_per_sec = _measure(rend_ert_cs)
    _mark("ERT+coarse_share path measured")
    grid_rays_per_sec = _measure(rend_grid)
    _mark("grid+ERT+share path measured")
    prop_rays_per_sec = _measure(rend_prop)
    _mark("distill+ERT+share path measured")

    tflops = rays_per_sec * _flops_per_ray() / 1e12
    print(
        json.dumps(
            {
                "metric": "nerf_render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
                # MFU-first leg: assumption-free, vs the chip's bf16 peak.
                # The 25k denominator above is the secondary, estimated
                # comparison.
                "tflops_effective": round(tflops, 1),
                "mfu_pct_peak_bf16": round(
                    100.0 * tflops / PEAK_TFLOPS_BF16, 1),
                # opt-in early-ray-termination variant (--fine_budget 64):
                # same frame, fine MLP on the top 64/128 samples
                "ert_fine_budget": ERT_FINE_BUDGET,
                "ert_rays_per_sec": round(ert_rays_per_sec, 1),
                "ert_vs_baseline": round(
                    ert_rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
                # stacked variant: ERT + shared coarse proposal
                # (--coarse_share; quality sweep in BASELINE.md)
                "ert_coarse_share": COARSE_SHARE,
                "ert_cs_rays_per_sec": round(ert_cs_rays_per_sec, 1),
                "ert_cs_vs_baseline": round(
                    ert_cs_rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
                # stacked density-grid proposal: coarse MLP -> voxel
                # gather (--sigma_grid), + ERT + share
                "grid_resolution": GRID_RES,
                "grid_ert_cs_rays_per_sec": round(grid_rays_per_sec, 1),
                "grid_ert_cs_vs_baseline": round(
                    grid_rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
                # stacked distilled proposal: coarse MLP -> tiny
                # MXU-shaped trunk (--proposal_width), + ERT + share
                "proposal_dims": f"D{PROPOSAL_DEPTH}xW{PROPOSAL_WIDTH}",
                "prop_ert_cs_rays_per_sec": round(prop_rays_per_sec, 1),
                "prop_ert_cs_vs_baseline": round(
                    prop_rays_per_sec / ASSUMED_REF_RAYS_PER_SEC, 2),
            }
        )
    )


def _run_with_watchdog(timeouts_s=(480, 480)) -> None:
    """Run the measurement in a child process and watchdog it from here.

    A wedged TPU compile service hangs inside blocking C calls, which
    in-process SIGALRM handlers cannot interrupt — only a parent-side kill
    works. The child enables the persistent XLA compilation cache, so a
    retry after a slow/cold first attempt usually compiles from disk; we
    therefore try twice before emitting the honest zero-value JSON line
    (never hang the driver)."""
    import subprocess

    note = "bench child never ran"
    for attempt, timeout_s in enumerate(timeouts_s):
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
            if proc.stderr:
                sys.stderr.write(proc.stderr[-2000:])
        except subprocess.TimeoutExpired:
            note = "TPU compile service unresponsive (watchdog timeout)"
        if attempt + 1 < len(timeouts_s):
            time.sleep(10.0)  # let a transiently wedged service recover
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
