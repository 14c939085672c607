"""Import a reference (PyTorch) experiment directory into tgtc checkpoints.

The reference trains into ``<basedir>/<expname>.../`` with three checkpoint
families discovered by filename substring (/root/reference/train_tgtcs.py:
60-82,139-146):

* NeRF ``%06d.tar``      — {global_step, model, model_fine, ...}
* ``style_%06d.tar``     — {model (style MLP), concat_model, ...}
* ``latent_%06d.tar``    — {train_set_1: StyleLatents state dict}

This tool converts the newest of each into tgtc's orbax checkpoints so a
reference user resumes mid-pipeline here::

    python -m tgtc.tools.import_reference --config configs/fern.txt \
        --ref_dir /path/to/reference/logs/fern_...

The 2D assets (``vgg_normalised.pth``/``decoder.pth``/``vae.pth``/
transformer+embedding pths) need no import: the pipeline loads them live
from the config paths (tgtc.train.pretrained).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp


def _newest(ref_dir: str, contains: str = "", excludes: List[str] = ()
            ) -> Optional[str]:
    """Reference discovery: newest sorted filename containing 'tar' plus the
    given substring (/root/reference/train_tgtcs.py:60)."""
    hits = [
        f for f in sorted(os.listdir(ref_dir))
        if "tar" in f and contains in f
        and not any(x in f for x in excludes)
    ]
    return os.path.join(ref_dir, hits[-1]) if hits else None


def import_reference_checkpoints(cfg, ref_dir: str, exp_dir: Optional[str]
                                 = None) -> dict:
    """Convert the newest NeRF / style / latent tars from ``ref_dir`` into
    orbax checkpoints under ``exp_dir`` (default ``cfg.exp_dir``).

    Returns {"nerf_step": int|None, "style_step": int|None}.
    """
    from tgtc.models.nerf import NerfConfig
    from tgtc.models.style_field import StyleFieldConfig
    from tgtc.models.torch_compat import (
        load_reference_latent_checkpoint,
        load_reference_nerf_checkpoint,
        load_reference_style_checkpoint,
    )
    from tgtc.train.checkpoint import CheckpointManager
    from tgtc.train.nerf_trainer import NerfTrainConfig, init_state
    from tgtc.train.style3d import StyleTrainConfig, init_style_state

    exp_dir = exp_dir or cfg.exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    out = {"nerf_step": None, "style_step": None}

    nerf_cfg = NerfConfig(
        depth=cfg.netdepth, width=cfg.netwidth,
        embed_freq_coor=cfg.embed_freq_coor,
        embed_freq_dir=cfg.embed_freq_dir,
        use_viewdir=cfg.use_viewdir, act_type=cfg.act_type,
        siren_sigma_mul=cfg.siren_sigma_mul,
    )
    fine_cfg = NerfConfig(
        depth=cfg.netdepth_fine, width=cfg.netwidth_fine,
        embed_freq_coor=cfg.embed_freq_coor,
        embed_freq_dir=cfg.embed_freq_dir,
        use_viewdir=cfg.use_viewdir, act_type=cfg.act_type,
        siren_sigma_mul=cfg.siren_sigma_mul,
    )
    train_cfg = NerfTrainConfig(
        batch_size=cfg.batch_size, lrate=cfg.lrate,
        lrate_decay=cfg.lrate_decay, n_samples=cfg.N_samples,
        n_samples_fine=cfg.N_samples_fine,
    )

    nerf_tar = _newest(ref_dir, excludes=["style", "latent"])
    if nerf_tar:
        step, coarse, fine = load_reference_nerf_checkpoint(
            nerf_tar, depth=cfg.netdepth, depth_fine=cfg.netdepth_fine
        )
        _, _, state = init_state(jax.random.PRNGKey(0), nerf_cfg, train_cfg,
                                 fine_cfg=fine_cfg)
        state = state.replace(
            step=jnp.asarray(step, jnp.int32),
            params_coarse=coarse,
            params_fine=fine if fine is not None else state.params_fine,
        )
        m = CheckpointManager(os.path.join(exp_dir, "ckpt_nerf"),
                              max_to_keep=cfg.ckp_num)
        m.save(step, jax.device_get(state), force=True)
        m.close()
        out["nerf_step"] = step
        print(f"[import] NeRF {nerf_tar} → ckpt_nerf @ step {step}")

    style_tar = _newest(ref_dir, contains="style")
    latent_tar = _newest(ref_dir, contains="latent")
    if style_tar and latent_tar:
        mlps = load_reference_style_checkpoint(style_tar)
        lat = load_reference_latent_checkpoint(latent_tar)
        s, f, d = lat["latents"].shape
        field = StyleFieldConfig(
            style_d=cfg.style_D, width=cfg.netwidth,
            latent_dim=cfg.vae_latent, embed_dim=nerf_cfg.input_ch,
        )
        step = int(os.path.basename(style_tar).split("_")[-1].split(".")[0])
        scfg = StyleTrainConfig(
            batch_size=cfg.batch_size_style, n_samples=cfg.N_samples,
            n_samples_fine=cfg.N_samples_fine,
            origin_step=cfg.origin_step, dataset_type=cfg.dataset_type,
        )
        _, _, sstate = init_style_state(
            jax.random.PRNGKey(0), field, scfg, s, f, latents_init=lat
        )
        sstate = sstate.replace(
            step=jnp.asarray(step, jnp.int32),
            params={"concat": mlps["concat"], "style": mlps["style"],
                    "latents": lat["latents"]},
        )
        m = CheckpointManager(os.path.join(exp_dir, "ckpt_style"),
                              max_to_keep=cfg.ckp_num)
        m.save(step, jax.device_get(sstate), force=True)
        m.close()
        out["style_step"] = step
        print(f"[import] style {style_tar} + {latent_tar} → ckpt_style "
              f"@ step {step}")

    if out["nerf_step"] is None and out["style_step"] is None:
        raise FileNotFoundError(f"no reference .tar checkpoints in {ref_dir}")
    return out


def main(argv=None) -> int:
    import argparse

    from tgtc.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_dir", required=True,
                    help="reference experiment dir holding *.tar ckpts")
    ap.add_argument("--exp_dir", default=None,
                    help="target tgtc experiment dir (default: cfg.exp_dir)")
    args, rest = ap.parse_known_args(argv)
    cfg = load_config(rest)
    import_reference_checkpoints(cfg, args.ref_dir, args.exp_dir)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
