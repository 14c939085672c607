"""The pipeline's fused (Pallas) Phase-F branch, driven end-to-end with the
kernel in interpret mode (regression for the packing/width bugs this path
has caught twice)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.config import Config
from tgtc.models.transformer import TransformerConfig
from tgtc.train.pipeline import Pipeline


class _StubRenderer:
    """Minimal .render contract of FusedStyleRenderer — lets the frame
    loop's IO semantics be tested without a kernel."""

    def render(self, bo, bd, sid, fid, key):
        t = jnp.linspace(0.0, 1.0, bo.shape[0])
        rgb = jnp.stack([t, 1.0 - t, 0.5 * t], -1)
        return {"rgb": rgb, "t_exp": t}


class TestDepthPngModes:
    """depth_png=full/half/off shapes the per-frame D2H + artifact set
    (the spiral's wall bottleneck on a tunneled host is the fetch)."""

    def _run(self, tmp_path, mode):
        from tgtc.train.render_style import render_stylized_frames_fused

        h, w = 6, 8
        rng = np.random.default_rng(0)
        ro = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
        rd = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        out = str(tmp_path / mode)
        n = render_stylized_frames_fused(
            _StubRenderer(), ro, rd, [0], out, jax.random.PRNGKey(0),
            block=16, depth_png=mode,
        )
        from tgtc.utils import native

        assert native.wait_writes() == 0
        assert n == 2
        return out, h, w

    def test_full_writes_fullres_depth(self, tmp_path):
        from PIL import Image

        out, h, w = self._run(tmp_path, "full")
        d = Image.open(os.path.join(out, "style_00000_fine_depth_00000.png"))
        assert d.size == (w, h)

    def test_half_writes_halfres_depth(self, tmp_path):
        from PIL import Image

        out, h, w = self._run(tmp_path, "half")
        d = Image.open(os.path.join(out, "style_00000_fine_depth_00000.png"))
        assert d.size == (w // 2, h // 2)
        rgb = Image.open(os.path.join(out, "style_00000_fine_00000.png"))
        assert rgb.size == (w, h)  # rgb artifact untouched

    def test_off_writes_no_depth(self, tmp_path):
        out, _, _ = self._run(tmp_path, "off")
        files = os.listdir(out)
        assert not any("depth" in f for f in files)
        assert len([f for f in files if f.endswith(".png")]) == 2

    def test_bad_mode_rejected(self, tmp_path):
        from tgtc.train.render_style import render_stylized_frames_fused

        with pytest.raises(ValueError, match="full/half/off"):
            render_stylized_frames_fused(
                _StubRenderer(), jnp.zeros((1, 4, 4, 3)),
                jnp.ones((1, 4, 4, 3)), [0], str(tmp_path / "bad"),
                jax.random.PRNGKey(0), depth_png="tiny",
            )


@pytest.mark.slow
def test_fused_stylized_render_through_pipeline(
    private_llff_dir, tmp_path, monkeypatch
):
    from PIL import Image

    import tgtc.render.fast_style as fs

    styles = tmp_path / "styles"
    styles.mkdir()
    rng = np.random.default_rng(7)
    Image.fromarray(
        (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    ).save(styles / "s.png")

    cfg = Config(
        expname="fusedf", basedir=str(tmp_path / "logs"),
        datadir=private_llff_dir, styledir=str(styles), factor=1.0,
        use_viewdir=True, netdepth=2, netwidth=32, netdepth_fine=2,
        netwidth_fine=32, embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4, batch_size=128, batch_size_style=32,
        origin_step=10, total_step=15, style_D=4, vae_latent=8, vae_w=16,
        vae_d=2, style_feature_dim=64, i_print=1000, sigma_noise_std=0.0,
        use_pallas=True, chunk=4096,
    )
    pipe = Pipeline(cfg)
    pipe.trans_cfg = TransformerConfig(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=32, dropout=0.0,
    )
    pipe.vae_iters = 2
    pipe.vae_patch = 32

    # force the fused branch on CPU: interpret-mode kernel + fake backend
    orig = fs.FusedStyleRenderer.from_params.__func__

    def patched(cls, *a, **kw):
        kw["interpret"] = True
        kw["tile"] = 128
        return orig(cls, *a, **kw)

    monkeypatch.setattr(fs.FusedStyleRenderer, "from_params",
                        classmethod(patched))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # run phases (XLA geometry path: use_pallas gates on default_backend,
    # so temporarily restore it for the non-F phases)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    pipe.train_nerf()
    pipe.ensure_geometry()
    pipe.ensure_style2d(c1_iters=2, c2_iters=1)
    pipe.train_style3d()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out_dir = pipe.render_stylized("train")

    files = sorted(f for f in os.listdir(out_dir)
                   if "depth" not in f and f.endswith(".png"))
    assert len(files) == 8  # 8 training views, 1 style
    Image_ = __import__("PIL.Image", fromlist=["Image"])
    img = np.asarray(Image_.open(os.path.join(out_dir, files[0])))
    assert img.std() > 0  # non-constant render
    # the turntable must have been STREAMED during the render (no PNG
    # re-read): one gif frame per rendered view
    gif = Image_.open(os.path.join(out_dir, "video.gif"))
    assert getattr(gif, "n_frames", 1) == 8

    # resume: frames already on disk are skipped, so the stream can't
    # cover playback order — the post-hoc writer must take over and
    # still produce a complete video
    os.remove(os.path.join(out_dir, "video.gif"))
    pipe.render_stylized("train")
    gif = Image_.open(os.path.join(out_dir, "video.gif"))
    assert getattr(gif, "n_frames", 1) == 8
    pipe.close()
