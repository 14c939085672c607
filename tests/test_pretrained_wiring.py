"""Pretrained-asset wiring: the pipeline must start its frozen VGG, decoder
and VAE from the reference's ``.pth`` files when present
(/root/reference/trans_train.py:112-118,
/root/reference/train_style_modules.py:271-279,339-344) — and fall back to
random init (loudly) when absent."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tgtc.config import Config
from tgtc.models.transformer import TransformerConfig
from tgtc.train.pipeline import Pipeline


def _vgg_state_dict(rng):
    """Full torch state dict in the ``vgg_normalised.pth`` sequential layout
    (/root/reference/tctrans.py:68-122)."""
    shapes = {0: (3, 3, 1, 1)}
    chans = [
        (2, 3, 64), (5, 64, 64), (9, 64, 128), (12, 128, 128),
        (16, 128, 256), (19, 256, 256), (22, 256, 256), (25, 256, 256),
        (29, 256, 512), (32, 512, 512), (35, 512, 512), (38, 512, 512),
        (42, 512, 512),
    ]
    for idx, cin, cout in chans:
        shapes[idx] = (cout, cin, 3, 3)
    sd = {}
    for idx, shape in shapes.items():
        sd[f"{idx}.weight"] = torch.from_numpy(
            rng.normal(scale=0.05, size=shape).astype(np.float32))
        sd[f"{idx}.bias"] = torch.from_numpy(
            rng.normal(scale=0.05, size=shape[0]).astype(np.float32))
    return sd


def _decoder_state_dict(rng):
    """torch state dict in the ``decoder.pth`` sequential layout
    (/root/reference/tctrans.py:36-66)."""
    idx_chans = [
        (1, 512, 256), (5, 256, 256), (8, 256, 256), (11, 256, 256),
        (14, 256, 128), (18, 128, 128), (21, 128, 64), (25, 64, 64),
        (28, 64, 3),
    ]
    sd = {}
    for idx, cin, cout in idx_chans:
        sd[f"{idx}.weight"] = torch.from_numpy(
            rng.normal(scale=0.05, size=(cout, cin, 3, 3)).astype(np.float32))
        sd[f"{idx}.bias"] = torch.from_numpy(
            rng.normal(scale=0.05, size=cout).astype(np.float32))
    return sd


def _vae_state_dict(rng, data_dim, latent, width, depth):
    """torch state dict in the reference VAE layout
    (/root/reference/models.py:371-473)."""
    def lin(o, i):
        return (
            torch.from_numpy(rng.normal(scale=0.05, size=(o, i)).astype(np.float32)),
            torch.from_numpy(rng.normal(scale=0.05, size=o).astype(np.float32)),
        )

    sd = {}
    d = data_dim
    for i in range(depth - 1):
        w, b = lin(width, d)
        sd[f"encoder.fc_layers.{i}.weight"] = w
        sd[f"encoder.fc_layers.{i}.bias"] = b
        d = width
    for name in ("mu", "log_var"):
        w, b = lin(latent, width)
        sd[f"encoder.fc_layer_{name}.weight"] = w
        sd[f"encoder.fc_layer_{name}.bias"] = b
    d = latent
    for i in range(depth - 1):
        w, b = lin(width, d)
        sd[f"decoder.fc_layers.{i}.weight"] = w
        sd[f"decoder.fc_layers.{i}.bias"] = b
        d = width
    w, b = lin(data_dim, width)
    sd["decoder.output_layer.weight"] = w
    sd["decoder.output_layer.bias"] = b
    return sd


@pytest.fixture(scope="module")
def pth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pretrained")
    rng = np.random.default_rng(3)
    torch.save(_vgg_state_dict(rng), d / "vgg_normalised.pth")
    torch.save(_decoder_state_dict(rng), d / "decoder.pth")
    return str(d)


@pytest.fixture(scope="module")
def style_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("styles")
    rng = np.random.default_rng(7)
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "style0.png")
    return str(d)


def _tiny_cfg(synthetic_llff_dir, style_dir, tmp_path, **kw):
    return Config(
        expname="pre", basedir=str(tmp_path / "logs"),
        datadir=synthetic_llff_dir, styledir=style_dir, factor=1.0,
        netdepth=2, netwidth=16, embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4, batch_size=64,
        origin_step=5, i_print=100, sigma_noise_std=0.0, use_pallas=False,
        **kw,
    )


class TestStytransOverlay:
    def test_vgg_and_decoder_subtrees_equal_converted(
        self, synthetic_llff_dir, style_dir, tmp_path, pth_dir
    ):
        """The pipeline's StyTrans VGG/decoder subtrees must equal the
        converted torch weights — not random init."""
        from tgtc.models.decoder import convert_torch_decoder
        from tgtc.models.vgg import convert_torch_vgg

        cfg = _tiny_cfg(
            synthetic_llff_dir, style_dir, tmp_path,
            vgg_pth_path=os.path.join(pth_dir, "vgg_normalised.pth"),
            decoder_pth_path=os.path.join(pth_dir, "decoder.pth"),
        )
        pipe = Pipeline(cfg)
        # d_model must be the reference 512 for the decoder weights to fit;
        # everything else stays tiny
        pipe.trans_cfg = TransformerConfig(
            d_model=512, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
            dim_feedforward=32, dropout=0.0,
        )
        model, params = pipe._stytrans_setup()
        assert pipe._pretrained_loaded["vgg"]
        assert pipe._pretrained_loaded["decoder"]

        vgg_sd = torch.load(cfg.vgg_pth_path, weights_only=False)
        want = convert_torch_vgg(vgg_sd)["params"]
        got = params["params"]["vgg"]
        # the (reference-parity) truncated VggEncoder instantiates only the
        # first 10 convs — conv4_2..conv5_1 of the pth are unused
        assert set(got) == {
            "conv0", "conv1_1", "conv1_2", "conv2_1", "conv2_2",
            "conv3_1", "conv3_2", "conv3_3", "conv3_4", "conv4_1",
        }
        for name in got:
            np.testing.assert_array_equal(
                np.asarray(got[name]["kernel"]),
                np.asarray(want[name]["kernel"]),
            )
        dec_sd = torch.load(cfg.decoder_pth_path, weights_only=False)
        want_d = convert_torch_decoder(dec_sd)["params"]
        got_d = params["params"]["decode"]
        for name in want_d:
            np.testing.assert_array_equal(
                np.asarray(got_d[name]["kernel"]),
                np.asarray(want_d[name]["kernel"]),
            )
        pipe.close()

    def test_random_fallback_without_files(
        self, synthetic_llff_dir, style_dir, tmp_path
    ):
        cfg = _tiny_cfg(
            synthetic_llff_dir, style_dir, tmp_path,
            vgg_pth_path=str(tmp_path / "nope.pth"),
            decoder_pth_path=str(tmp_path / "nope2.pth"),
        )
        pipe = Pipeline(cfg)
        pipe.trans_cfg = TransformerConfig(
            d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
            dim_feedforward=32, dropout=0.0,
        )
        model, params = pipe._stytrans_setup()
        assert not pipe._pretrained_loaded["vgg"]
        assert not pipe._pretrained_loaded["decoder"]
        pipe.close()

    def test_mismatched_decoder_is_skipped(
        self, synthetic_llff_dir, style_dir, tmp_path, pth_dir
    ):
        """A reference-size (512-ch) decoder must NOT overlay onto a
        small-d_model config — the shape gate keeps random init instead of
        corrupting the tree."""
        cfg = _tiny_cfg(
            synthetic_llff_dir, style_dir, tmp_path,
            vgg_pth_path=os.path.join(pth_dir, "vgg_normalised.pth"),
            decoder_pth_path=os.path.join(pth_dir, "decoder.pth"),
        )
        pipe = Pipeline(cfg)
        pipe.trans_cfg = TransformerConfig(
            d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
            dim_feedforward=32, dropout=0.0,
        )
        model, params = pipe._stytrans_setup()
        assert pipe._pretrained_loaded["vgg"]      # VGG is size-independent
        assert not pipe._pretrained_loaded["decoder"]
        # the tree stays usable
        x = jnp.zeros((1, 32, 32, 3))
        ics, hs = model.apply(params, x, x, method=model.stylize)
        assert ics.shape[0] == 1
        pipe.close()

    def test_pretrained_features_differ_from_random(self, pth_dir):
        """Content-loss sanity: features of the same image under the
        pretrained VGG differ from random-init features (a transformer
        trained against a random VGG optimizes a different objective)."""
        from tgtc.models.vgg import make_vgg
        from tgtc.train.pretrained import load_vgg_overlay

        vgg, rand_params = make_vgg(jax.random.PRNGKey(0), image_size=16)
        overlay = load_vgg_overlay(os.path.join(pth_dir, "vgg_normalised.pth"))
        assert overlay is not None
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 16, 16, 3)),
            jnp.float32,
        )
        f_rand = vgg.apply(rand_params, img)[-1]
        f_pre = vgg.apply({"params": overlay}, img)[-1]
        assert not np.allclose(np.asarray(f_rand), np.asarray(f_pre))


class TestVaePretrained:
    def test_vae_pth_short_circuits_training(
        self, synthetic_llff_dir, style_dir, tmp_path
    ):
        """ensure_vae with a vae.pth present loads the converted params and
        skips training entirely."""
        from tgtc.models.torch_compat import convert_torch_vae

        rng = np.random.default_rng(5)
        sd = _vae_state_dict(rng, data_dim=64, latent=8, width=16, depth=2)
        vae_path = tmp_path / "vae.pth"
        torch.save(sd, vae_path)

        cfg = _tiny_cfg(
            synthetic_llff_dir, style_dir, tmp_path,
            vae_latent=8, vae_w=16, vae_d=2, style_feature_dim=64,
            vae_pth_path=str(vae_path),
            vgg_pth_path=str(tmp_path / "absent.pth"),
        )
        pipe = Pipeline(cfg)
        model, vstate = pipe.ensure_vae(iters=3)
        want = convert_torch_vae(torch.load(vae_path, weights_only=False),
                                 depth=2)
        got = vstate.params
        np.testing.assert_array_equal(
            np.asarray(got["params"]["encoder"]["mu"]["kernel"]),
            np.asarray(want["params"]["encoder"]["mu"]["kernel"]),
        )
        # training was skipped: step jumped straight to max_iter
        assert int(vstate.step) == 3
        # the loaded VAE must be usable for encoding
        x = jnp.zeros((2, 64))
        mu, logvar = model.apply(vstate.params, x, method=model.encode)
        assert mu.shape == (2, 8)
        pipe.close()
