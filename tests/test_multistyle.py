"""Multi-style (S>1) end-to-end: C3 must emit per-style stylized frame dirs,
Phase E must train over the populated [S, F] axis, and Phase F must render
``style_00001_fine_*.png`` (the second style) — the reference's dataset
carries the S axis but its pipeline only ever fills S=1
(/root/reference/trans_test.py:141-144)."""

import os

import numpy as np
import pytest

from tgtc.config import Config
from tgtc.models.transformer import TransformerConfig
from tgtc.train.pipeline import Pipeline


@pytest.fixture(scope="module")
def two_style_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("styles2")
    rng = np.random.default_rng(11)
    for i in range(2):
        img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"style{i}.png")
    return str(d)


@pytest.mark.slow
def test_two_styles_end_to_end(private_llff_dir, two_style_dir, tmp_path):
    cfg = Config(
        expname="multistyle",
        basedir=str(tmp_path / "logs"),
        datadir=private_llff_dir,
        styledir=two_style_dir,
        factor=1.0,
        use_viewdir=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4,
        batch_size=128, batch_size_style=32,
        origin_step=10, total_step=16,
        style_D=4, vae_latent=8, vae_w=16, vae_d=2,
        style_feature_dim=64,
        i_print=10, sigma_noise_std=0.0,
        use_pallas=False,
    )
    pipe = Pipeline(cfg)
    pipe.trans_cfg = TransformerConfig(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=32, dropout=0.0,
    )
    pipe.vae_iters = 2
    pipe.vae_patch = 32

    pipe.train_nerf()
    pipe.ensure_geometry()
    pipe.ensure_style2d(c1_iters=2, c2_iters=2)

    # C3 wrote per-style subdirs + a 2-row npz
    npz = np.load(os.path.join(pipe.stylized_dir, "stylized_data.npz"),
                  allow_pickle=True)
    assert npz["style_features"].shape[0] == 2
    for s in range(2):
        sub = os.path.join(pipe.stylized_dir, f"style_{s:02d}")
        assert os.path.exists(os.path.join(sub, "001.jpg")), sub

    # E trains over S=2; F renders BOTH styles
    pipe.train_style3d()
    assert pipe._style[2].params["latents"].shape[0] == 2
    out_dir = pipe.render_stylized("train")
    firsts = [f for f in os.listdir(out_dir)
              if f.startswith("style_00000_fine_0")]
    seconds = [f for f in os.listdir(out_dir)
               if f.startswith("style_00001_fine_0")]
    assert firsts and seconds, sorted(os.listdir(out_dir))[:8]
    pipe.close()
