"""Configuration system.

Replaces the reference's flat configargparse namespace
(/root/reference/config.py:5-148) with a typed dataclass, while keeping
**file-format compatibility** with the reference's ``configs/*.txt``
(``key = value`` lines, bare flags, ``#`` comments) so existing per-scene
configs (fern/flower/horns/orchids/trex) port unchanged.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, fields
from typing import Any, Dict, List, Optional


@dataclass
class Config:
    """All knobs for the full pipeline. Field names match the reference CLI
    flags 1:1 (see /root/reference/config.py) so config files interoperate."""

    # experiment / paths
    config: str = ""
    expname: str = "exp"
    basedir: str = "./logs/"
    datadir: str = "./data/"
    styledir: str = "./style/"
    dataset_type: str = "llff"
    no_ndc: bool = False
    white_bkgd: bool = False
    half_res: bool = False
    spherify: bool = False

    # pretrained assets
    decoder_pth_path: str = "./pretrained/decoder.pth"
    vgg_pth_path: str = "./pretrained/vgg_normalised.pth"
    vae_pth_path: str = "./pretrained/vae.pth"

    # data factors
    factor: float = 1.0
    gen_factor: float = 0.2
    valid_factor: float = 0.05
    num_workers: int = 0
    store_rays: int = 1

    # training options
    use_viewdir: bool = False
    sample_type: str = "uniform"
    act_type: str = "relu"
    nerf_type: str = "nerf"
    style_type: str = "mlp"
    latent_type: str = "variational"
    nerf_type_fine: str = "nerf"
    sigma_noise_std: float = 1.0
    siren_sigma_mul: float = 20.0

    # loss weights
    rgb_loss_lambda: float = 1.0
    rgb_loss_lambda_2d: float = 10.0
    style_loss_lambda: float = 1.0
    content_loss_lambda: float = 1.0
    loss_coh_lambda: float = 5e3
    logp_loss_lambda: float = 0.1
    logp_loss_decay: float = 1.0
    # coherence gate: the reference hardcodes ``global_step > 122000``
    # (/root/reference/train_tgtcs.py:486) = origin_step + 1999 for the
    # shipped origin_step=120001. -1 derives it that way for ANY
    # origin_step; set explicitly to pin an absolute step.
    coh_until_step: int = -1
    lambda_u: float = 0.01

    # network
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    style_D: int = 8
    style_feature_dim: int = 1024

    # VAE
    vae_d: int = 4
    vae_w: int = 512
    vae_latent: int = 32
    vae_kl_lambda: float = 0.1

    # embedding / batching / lr
    embed_freq_coor: int = 10
    embed_freq_dir: int = 4
    batch_size: int = 2048
    batch_size_style: int = 1024
    lrate: float = 5e-4
    lrate_decay: int = 100000
    chunk: int = 1024 * 32
    no_reload: bool = False
    total_step: int = 50000001
    origin_step: int = 250000
    decoder_step: int = 170000
    steps_per_opt: int = 1
    steps_patch: int = -1

    N_samples: int = 64
    N_samples_fine: int = 64

    # logging/saving
    i_print: int = 100
    i_weights: int = 5000
    # accepted for config-file parity but DEAD IN THE REFERENCE ITSELF
    # (/root/reference/config.py:126 defines it; nothing reads it) — the
    # turntable video is written unconditionally at the end of Phase F.
    # See DESIGN.md "Dead reference flags".
    i_video: int = 50000 * 100
    ckp_num: int = 3

    # render switches
    render_valid: bool = False
    render_train: bool = False
    render_valid_style: bool = False
    render_train_style: bool = False
    sigma_scale: float = 1.0

    pixel_alignment: bool = False
    TT_far: float = 8.0

    # --- TPU-native additions (no reference analog) ---
    use_pallas: bool = True      # fused trunk kernel for bulk renders
    coh_lambda_auto: bool = False  # rescale loss_coh_lambda when the
    #                              Phase-E start diagnostic finds the
    #                              coherence gradient dominating rgb >10x
    #                              (train/style3d.py coherence_grad_ratio);
    #                              off = warn only, reference math exact
    fine_budget: int = 0         # early ray termination for Phase-F/plain
    #                              renders: evaluate the fine MLP on only
    #                              the N highest-estimated-contribution
    #                              merged samples per ray (0 = off, exact
    #                              reference parity; see
    #                              ops.sampling.select_sample_budget).
    #                              Phase-B geometry dumps always render
    #                              full — depth maps feed later training.
    train_fine_budget: str = ""  # step-scheduled ERT at TRAINING time
    #                              (Phases A and E): comma-separated
    #                              "BUDGET@START" segments, e.g.
    #                              "96@60000,80@90000" = exact until 60k,
    #                              fine budget 96 until 90k, then 80. A
    #                              bare "80" applies from step 0. "" =
    #                              off, bit-parity with the reference's
    #                              evaluate-all training
    #                              (train/nerf_trainer.py parse_budget_
    #                              schedule). Phase E uses the LAST
    #                              segment's budget (its density is
    #                              frozen-converged). Budgets must
    #                              tighten over the schedule.
    coarse_share: int = 1        # shared coarse proposal for plain renders:
    #                              run the whole proposal chain (coarse σ →
    #                              weights → resample → select) once per
    #                              group of N scanline-adjacent pixels and
    #                              share the resampled/selected depth set
    #                              across the group; the fine MLP still
    #                              evaluates every ray's own 3-D points
    #                              (render.fast coarse_share). 1 = off,
    #                              exact reference parity.
    proposal_width: int = 0      # distilled-proposal trunk width for the
    #                              fused renders (render.distill): after
    #                              Phase A the density is frozen, so the
    #                              coarse proposal MLP is distilled ONCE
    #                              per checkpoint into a tiny MXU-shaped
    #                              trunk (proposal_depth x proposal_width;
    #                              128 = one MXU lane tile, ~19x fewer
    #                              FLOPs than the D8xW256 sigma pass) and
    #                              used in place of the coarse net. 0 =
    #                              off (exact reference parity: the full
    #                              coarse MLP runs on every ray of every
    #                              frame, /root/reference/rendering.py:
    #                              27-36). Composes with fine_budget and
    #                              coarse_share; mutually exclusive with
    #                              sigma_grid.
    proposal_depth: int = 2      # distilled-proposal trunk depth
    proposal_steps: int = 3000   # distillation regression steps (expectile
    #                              tau=0.85, render.distill); ~seconds on
    #                              TPU, once per checkpoint per process
    sigma_grid: int = 0          # density-grid proposal for the fused
    #                              renders (render.grid): snapshot the
    #                              frozen fine density onto an N^3 voxel
    #                              grid ONCE per render invocation and
    #                              replace the per-frame coarse MLP with a
    #                              trilinear gather. 0 = off (exact
    #                              reference parity: the coarse net runs
    #                              on every ray of every frame,
    #                              /root/reference/rendering.py:27-36).
    #                              Composes with fine_budget/coarse_share.
    depth_png: str = "full"      # per-frame depth PNG for the render
    #                              phases: "full" (reference parity: one
    #                              normalized full-res depth image per
    #                              frame), "half" (2x2-mean-pooled uint8 —
    #                              ~1/4 the D2H bytes; this host's tunnel
    #                              fetches ~2 MB/s, so depth IO is a
    #                              material share of spiral wall time), or
    #                              "off" (rgb only). Depth maps consumed by
    #                              later phases (Phase-B geometry) are
    #                              unaffected — this only shapes the
    #                              human-facing render artifacts.
    mesh_devices: int = 0        # 0 = all local devices
    seed: int = 0
    debug_nans: bool = False     # jax_debug_nans — the analog of the
    #                              reference's autograd anomaly mode
    #                              (/root/reference/train_tgtcs.py:311)
    profile_dir: str = ""        # capture a jax.profiler trace of the first
    #                              training steps into this directory

    @property
    def exp_dir(self) -> str:
        # parity with the reference run-dir naming
        # (/root/reference/train_tgtcs.py:20)
        name = (
            f"{self.expname}_{self.nerf_type}_{self.act_type}"
            f"_Viewdir{self.use_viewdir}_factor{self.factor}"
        )
        return os.path.join(self.basedir, name)


_BOOL_FIELDS = {
    f.name for f in fields(Config) if f.type in ("bool", bool)
}


def _coerce(name: str, raw: str) -> Any:
    ftypes = {f.name: f.type for f in fields(Config)}
    t = ftypes.get(name)
    raw = raw.strip()
    if t in ("bool", bool):
        return raw.lower() in ("1", "true", "yes", "on", "")
    if t in ("int", int):
        return int(float(raw))
    if t in ("float", float):
        return float(raw)
    return raw


def parse_config_file(path: str) -> Dict[str, Any]:
    """Parse a reference-style ``key = value`` config file
    (e.g. /root/reference/configs/fern.txt)."""
    out: Dict[str, Any] = {}
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = _coerce(k.strip(), v)
            else:
                # bare flag, e.g. "use_viewdir"
                out[line] = True
    return out


def load_config(argv: Optional[List[str]] = None) -> Config:
    """CLI entry: ``--config file.txt`` plus ``--key value`` overrides
    (override precedence: CLI > file > defaults, like configargparse)."""
    parser = argparse.ArgumentParser(prog="tgtc")
    parser.add_argument("--config", type=str, default="")
    for f in fields(Config):
        if f.name == "config":
            continue
        if f.name in _BOOL_FIELDS:
            parser.add_argument(f"--{f.name}", action="store_true", default=None)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=None)
    ns = parser.parse_args(argv)

    values: Dict[str, Any] = {}
    if ns.config:
        values.update(parse_config_file(ns.config))
        values["config"] = ns.config
    for f in fields(Config):
        v = getattr(ns, f.name, None)
        if v is not None and f.name != "config":
            values[f.name] = v if f.name in _BOOL_FIELDS else _coerce(f.name, v)
    known = {f.name for f in fields(Config)}
    values = {k: v for k, v in values.items() if k in known}
    return Config(**values)
