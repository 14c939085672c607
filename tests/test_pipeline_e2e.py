"""End-to-end smoke: all phases A→F on a tiny synthetic scene through the
Pipeline orchestrator (the reference has no analog — SURVEY.md §4 calls for
exactly this)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.config import Config
from tgtc.models.transformer import TransformerConfig
from tgtc.train.pipeline import Pipeline


@pytest.fixture(scope="module")
def style_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("styles")
    rng = np.random.default_rng(7)
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "style0.png")
    return str(d)


@pytest.mark.slow
def test_full_pipeline_smoke(private_llff_dir, style_dir, tmp_path):
    cfg = Config(
        expname="smoke",
        basedir=str(tmp_path / "logs"),
        datadir=private_llff_dir,
        styledir=style_dir,
        factor=1.0,
        use_viewdir=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4,
        batch_size=128, batch_size_style=32,
        origin_step=25, total_step=35,
        style_D=4, vae_latent=8, vae_w=16, vae_d=2,
        style_feature_dim=64,  # tiny transformer → 2*32
        i_print=10, sigma_noise_std=0.0,
        use_pallas=False,
    )
    pipe = Pipeline(cfg)
    pipe.trans_cfg = TransformerConfig(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=32, dropout=0.0,
    )
    pipe.vae_iters = 3
    pipe.vae_patch = 32

    # A — NeRF pretrain
    pipe.train_nerf()
    assert pipe.nerf_ckpt.latest_step() == 25

    # B — geometry dump
    pipe.ensure_geometry()
    assert os.path.exists(os.path.join(pipe.gen_dir, "geometry.npz"))
    assert os.path.exists(os.path.join(pipe.gen_dir, "rgb_00000.png"))

    # C — 2D style pipeline (tiny iters)
    pipe.ensure_style2d(c1_iters=3, c2_iters=2)
    assert os.path.exists(
        os.path.join(pipe.stylized_dir, "stylized_data.npz")
    )
    assert os.path.exists(os.path.join(pipe.stylized_dir, "001.jpg"))
    # visual-debug artifacts: C1 content/style/stylized collage
    # (reference trans_train.py:180-183) and the end-of-C2 warp dumps
    # (reference train_style_modules.py:519-528)
    assert os.path.exists(os.path.join(pipe.exp_dir, "test", "3.png"))
    for name in ("stylized_content", "warped_stylized_content",
                 "warped_mask", "coor_dist_msk"):
        assert os.path.exists(
            os.path.join(pipe.exp_dir, f"{name}_000.png")
        ), name
    assert os.path.exists(os.path.join(pipe.exp_dir, "style_image.png"))

    # D+E — VAE, latent seeding, style-field training
    pipe.train_style3d()
    assert pipe.style_ckpt.latest_step() is not None
    assert int(pipe._style[2].step) >= 35

    # F — stylized render at training poses
    out_dir = pipe.render_stylized("train")
    pngs = [f for f in os.listdir(out_dir) if f.startswith("style_")]
    assert len(pngs) > 0
    pipe.close()


@pytest.mark.slow
def test_resume_from_checkpoint(synthetic_llff_dir, style_dir, tmp_path):
    """Re-entrancy: a second Pipeline resumes Phase A from the checkpoint
    instead of restarting (the reference's crash-restart story)."""
    cfg = Config(
        expname="resume", basedir=str(tmp_path / "logs"),
        datadir=synthetic_llff_dir, styledir=style_dir, factor=1.0,
        netdepth=2, netwidth=16, embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4, batch_size=64,
        origin_step=10, i_print=100, sigma_noise_std=0.0, use_pallas=False,
    )
    p1 = Pipeline(cfg)
    p1.train_nerf()
    assert p1.nerf_ckpt.latest_step() == 10
    p1.close()

    p2 = Pipeline(cfg)
    cm, fm, state, _ = p2._nerf_setup()
    assert int(state.step) == 10
    p2.train_nerf()  # already done — returns immediately
    p2.close()


@pytest.mark.slow
def test_evaluate_holdout(synthetic_llff_dir, style_dir, tmp_path):
    """PSNR evaluation on the holdout view after a short Phase-A run."""
    cfg = Config(
        expname="eval", basedir=str(tmp_path / "logs"),
        datadir=synthetic_llff_dir, styledir=style_dir, factor=1.0,
        netdepth=2, netwidth=32, embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4, batch_size=256,
        origin_step=200, i_print=1000, sigma_noise_std=0.0, use_pallas=False,
        lrate=5e-3,
    )
    pipe = Pipeline(cfg)
    pipe.train_nerf()
    psnr = pipe.evaluate()
    assert np.isfinite(psnr)
    assert psnr > 18, f"holdout PSNR too low after 200 steps: {psnr:.2f}"
    pipe.close()
