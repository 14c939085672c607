"""Distilled proposal MLP: the TPU-native frozen-density proposal.

The reference's coarse network exists only to steer fine sampling, yet it
re-runs a full D8xW256 NeRF on 64 uniform samples of every ray of every
frame (/root/reference/rendering.py:27-36, utils.py:509-531). After Phase
A the density field is FROZEN for every downstream phase, so the proposal
can be a far smaller function fitted once per checkpoint.

The GPU-native answer is an occupancy/voxel grid — measured SLOWER than
the coarse MLP on TPU v5e (random-gather issue rate ~130M elems/s vs the
MXU's 125 TFLOP/s; see BASELINE.md "Density-grid proposal ... NEGATIVE").
The TPU-native answer is to stay in MXU-shaped compute: distill the frozen
fine density into a TINY trunk (default D2xW128 — width 128 exactly fills
one MXU/VPU lane tile, ~19x fewer FLOPs than the D8xW256 sigma pass) and
use it as the coarse proposal. Same idea as Mip-NeRF 360's proposal MLP,
but fitted post-hoc by regression so Phase-A training stays exact
reference parity.

Two regression choices matter, both MEASURED on the spec stress scene
(100k-step checkpoint, holdout-view GT delta of the proposal render;
BASELINE.md round 5):

* **Clip the target at the alpha-saturation point.** Converged NeRF
  densities reach thousands at surfaces, but alpha = 1 - exp(-sigma*dt)
  saturates near sigma ~ 10*n_samples/(far-near) (~640 for 64 samples on
  [0,1]); regressing the unbounded magnitudes wastes capacity on values
  the compositor cannot distinguish. Clip: spec delta 0.285 -> 0.165 dB.
* **Symmetric loss beats a conservative (expectile) bias.** tau=0.85
  biases relu-sigma +28 even after clipping, spreading importance weight
  into empty space: 0.165 dB; plain MSE (tau=0.5) is near-unbiased and
  measures 0.037 dB. The "over-estimate is the safe direction" intuition
  (grid builder's corner max-pool) does NOT carry over to a global
  regression, where the bias is paid everywhere. tau stays available for
  scenes with known thin structure; the default is symmetric.

Capacity/steps saturate: W256 and 9k steps measured within 0.01 dB of
W128/3k.

Opt-in (``Config.proposal_width``); default off = exact reference parity.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgtc.models.nerf import NerfConfig, NerfMLP, make_nerf
from tgtc.ops.encoding import positional_encoding

Params = Any


def proposal_config(fine_cfg: NerfConfig, depth: int = 2,
                    width: int = 128) -> NerfConfig:
    """Architecture of the distilled proposal: a standard NerfMLP (so the
    packing/kernel/converter machinery applies unchanged) with a tiny
    trunk. Encoding frequencies follow the fine net — the proposal must
    resolve the same spatial bandwidth it is approximating."""
    return NerfConfig(
        depth=depth, width=width,
        embed_freq_coor=fine_cfg.embed_freq_coor,
        embed_freq_dir=fine_cfg.embed_freq_dir,
        use_viewdir=fine_cfg.use_viewdir,
        act_type="relu", skips=fine_cfg.skips,
        compute_dtype=fine_cfg.compute_dtype,
    )


def distill_proposal(
    key: jax.Array,
    fine_cfg: NerfConfig,
    params_fine: Params,
    rays_o: jnp.ndarray,          # [N, 3] training-ray pool (device-resident)
    rays_d: jnp.ndarray,          # [N, 3]
    near: float,
    far: float,
    *,
    depth: int = 2,
    width: int = 128,
    steps: int = 3000,
    batch: int = 65536,
    lr: float = 3e-3,
    tau: float = 0.5,
    sigma_clip: Tuple[float, float] = None,
    n_samples: int = 64,
    scan_chunk: int = 50,
) -> Tuple[Params, Dict[str, float]]:
    """Fit a tiny proposal trunk to the frozen fine density by (optionally
    expectile-weighted) regression on points sampled like render points
    (random training ray x uniform t in [near, far]) — the distribution
    the proposal is queried on. ``sigma_clip`` defaults to the
    alpha-saturation point ``10 * n_samples / (far - near)`` (see module
    docstring). Returns ``(params, stats)``; stats carries the final loss
    and the signed bias (mean(pred - target) on relu'd sigma)."""
    if not 0.5 <= tau < 1.0:
        raise ValueError(f"tau {tau}: expectile weight must be in [0.5, 1)")
    if sigma_clip is None:
        sigma_clip = (-20.0, 10.0 * n_samples / max(far - near, 1e-6))
    fine_model = NerfMLP(fine_cfg)
    prop_cfg = proposal_config(fine_cfg, depth=depth, width=width)
    prop_model, params = make_nerf(prop_cfg, key)

    ro = jnp.asarray(rays_o, jnp.float32).reshape(-1, 3)
    rd = jnp.asarray(rays_d, jnp.float32).reshape(-1, 3)
    n = ro.shape[0]
    # sigma ignores dirs; a zero-dir encoding keeps both applies happy
    dirs0 = jnp.zeros((batch, 3), jnp.float32)
    de_f = positional_encoding(dirs0, fine_cfg.embed_freq_dir)
    de_p = positional_encoding(dirs0, prop_cfg.embed_freq_dir)

    sched = optax.cosine_decay_schedule(lr, steps)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    lo, hi = sigma_clip

    def loss_fn(p, pts):
        pe_c = positional_encoding(pts, fine_cfg.embed_freq_coor)
        tgt = fine_model.apply(params_fine, pe_c, de_f)["sigma"]
        tgt = jax.lax.stop_gradient(jnp.clip(tgt, lo, hi))
        pe_p = (pe_c if prop_cfg.embed_freq_coor == fine_cfg.embed_freq_coor
                else positional_encoding(pts, prop_cfg.embed_freq_coor))
        pred = prop_model.apply(p, pe_p, de_p)["sigma"]
        err = tgt - pred
        w = jnp.where(err > 0, tau, 1.0 - tau)
        loss = jnp.mean(w * err * err)
        bias = jnp.mean(jax.nn.relu(pred) - jax.nn.relu(tgt))
        return loss, bias

    def one_step(carry, k):
        p, s = carry
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (batch,), 0, n)
        t = jax.random.uniform(k2, (batch, 1), minval=near, maxval=far)
        pts = jnp.take(ro, idx, axis=0) + t * jnp.take(rd, idx, axis=0)
        (loss, bias), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, pts)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), (loss, bias)

    @jax.jit
    def run_chunk(p, s, keys):
        (p, s), (losses, biases) = jax.lax.scan(one_step, (p, s), keys)
        return p, s, losses[-1], biases[-1]

    loss = bias = float("nan")
    for start in range(0, steps, scan_chunk):
        m = min(scan_chunk, steps - start)
        keys = jax.random.split(
            jax.random.fold_in(key, 1 + start), m)
        params, opt_state, loss, bias = run_chunk(params, opt_state, keys)
    loss = float(np.asarray(loss))
    bias = float(np.asarray(bias))
    return params, {"loss": loss, "relu_sigma_bias": bias,
                    "depth": depth, "width": width, "steps": steps}
