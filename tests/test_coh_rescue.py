"""Coherence-regime rescue, end-to-end (VERDICT r4 item 6).

The reference's fixed λ_coh schedule (loss_coh_lambda=5000 on llff,
/root/reference/train_tgtcs.py:482-483) silently trains a visually dead
Phase E on high-chroma scenes: the scale-invariant cosine term's gradient
dwarfs the rgb term. The pipeline probes the gradient ratio at phase start
(train/style3d.py:coherence_grad_ratio). This test drives the REAL
pipeline on a high-chroma synthetic scene and asserts the full loop:

  * default run: COH DIAG line (ratio >> threshold) lands in train.jsonl
    and the loud warning is printed — the failure is no longer silent;
  * --coh_lambda_auto: λ is rescaled at phase start and the SAME run
    converges (rgb MSE well below the default run's plateau).
"""

import json
import os
import shutil

import numpy as np
import pytest

from tgtc.config import Config
from tgtc.models.transformer import TransformerConfig
from tgtc.train.pipeline import Pipeline


def _cfg(scene, styles, basedir, **kw):
    return Config(
        expname="coh", basedir=basedir, datadir=scene, styledir=styles,
        factor=1.0, use_viewdir=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        embed_freq_coor=2, embed_freq_dir=1, N_samples=4, N_samples_fine=4,
        batch_size=128, batch_size_style=32,
        origin_step=25, total_step=125,
        style_D=4, vae_latent=8, vae_w=16, vae_d=2, style_feature_dim=64,
        i_print=50, sigma_noise_std=0.0, use_pallas=False,
        **kw,
    )


def _pipe(cfg):
    p = Pipeline(cfg)
    p.trans_cfg = TransformerConfig(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=32, dropout=0.0,
    )
    p.vae_iters = 3
    p.vae_patch = 32
    return p


def _metrics(exp_dir):
    lines = [json.loads(l)
             for l in open(os.path.join(exp_dir, "logs", "train.jsonl"))]
    diag = [l for l in lines if "coh_grad_ratio" in l]
    style = [l for l in lines if "loss_rgb" in l]
    return diag, style


@pytest.mark.slow
def test_coh_warning_and_auto_rescue(synthetic_llff_dir, tmp_path, capsys):
    """High-chroma scene (random-color style image): the default reference
    λ must warn loudly + log the diag; coh_lambda_auto must converge."""
    from PIL import Image

    styles = tmp_path / "styles"
    styles.mkdir()
    rng = np.random.default_rng(7)
    Image.fromarray((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
                    ).save(styles / "style0.png")
    basedir = str(tmp_path / "logs")

    # ---- run 1: reference defaults (loss_coh_lambda=5000)
    pipe = _pipe(_cfg(str(synthetic_llff_dir), str(styles), basedir))
    pipe.train_nerf()
    pipe.ensure_geometry()
    pipe.ensure_style2d(c1_iters=3, c2_iters=2)
    pipe.train_style3d()
    exp = pipe.exp_dir
    pipe.close()

    diag, style = _metrics(exp)
    assert diag, "COH DIAG line missing from train.jsonl"
    ratio = diag[0]["coh_grad_ratio"]
    assert ratio > 10.0, ratio  # the regime this scene exists to trigger
    out = capsys.readouterr().out
    assert "WARNING: the coherence loss gradient" in out
    assert "--loss_coh_lambda" in out  # actionable suggestion
    rgb_default = style[-1]["loss_rgb"]

    # ---- run 2: same scene/artifacts, --coh_lambda_auto (fresh Phase E)
    shutil.rmtree(os.path.join(exp, "ckpt_style"))
    pipe2 = _pipe(_cfg(str(synthetic_llff_dir), str(styles), basedir,
                       coh_lambda_auto=True))
    pipe2.train_style3d()
    pipe2.close()

    out2 = capsys.readouterr().out
    assert "coh_lambda_auto rescaled" in out2
    _, style2 = _metrics(exp)
    rgb_auto = style2[-1]["loss_rgb"]
    # the rescued run converges; the default plateaus (probe run:
    # 0.032 vs 0.079 after 100 steps on this scene)
    assert rgb_auto < 0.06, rgb_auto
    assert rgb_auto < 0.75 * rgb_default, (rgb_auto, rgb_default)
