"""tgtc.cli end-to-end: the reference's exact invocation shapes
(`python -m tgtc.cli --config <file> [--render_valid]`,
/root/reference/README.md:25-33) drive the pipeline."""

import os

import numpy as np
import pytest

from tgtc.cli import main


@pytest.fixture()
def tiny_config_file(synthetic_llff_dir, tmp_path):
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    from PIL import Image

    Image.fromarray(
        (np.random.default_rng(0).uniform(size=(32, 32, 3)) * 255
         ).astype(np.uint8)
    ).save(style_dir / "s.png")
    cfg = tmp_path / "scene.txt"
    cfg.write_text(f"""expname = cli_e2e
basedir = {tmp_path}/logs
datadir = {synthetic_llff_dir}
styledir = {style_dir}
dataset_type = llff
factor = 1
batch_size = 64
N_samples = 4
N_samples_fine = 4
netdepth = 2
netwidth = 16
netdepth_fine = 2
netwidth_fine = 16
embed_freq_coor = 2
embed_freq_dir = 1
origin_step = 6
sigma_noise_std = 0
use_viewdir
""")
    return str(cfg)


@pytest.mark.slow
def test_cli_trains_phase_a(tiny_config_file, tmp_path, monkeypatch):
    # stub the (slow, full-size-network) phases past B so the CLI test stays
    # a CLI test: dispatch, config-file parsing, Phase A, auto-eval, B
    from tgtc.train.pipeline import Pipeline

    monkeypatch.setattr(Pipeline, "ensure_style2d",
                        lambda self, *a, **k: None)
    monkeypatch.setattr(Pipeline, "train_style3d", lambda self: None)
    rc = main(["--config", tiny_config_file])
    assert rc == 0 or rc is None
    exp = [d for d in (tmp_path / "logs").iterdir() if d.is_dir()][0]
    assert (exp / "ckpt_nerf").exists()
    assert (exp / "nerf_gen_data2" / "geometry.npz").exists()
    # auto-eval after Phase A logged a PSNR line
    logged = (exp / "logs" / "train.jsonl").read_text()
    assert "psnr" in logged and "holdout_view" in logged


@pytest.mark.slow
def test_cli_render_valid(tiny_config_file, tmp_path):
    # second invocation: plain validation render from the checkpoint
    rc = main(["--config", tiny_config_file, "--render_valid"])
    assert rc == 0 or rc is None
    exp = [d for d in (tmp_path / "logs").iterdir() if d.is_dir()][0]
    out = exp / "render_valid"
    pngs = [f for f in os.listdir(out) if f.startswith("rgb_")]
    assert len(pngs) > 0
    assert (out / "video.gif").exists()  # plain-render turntable
