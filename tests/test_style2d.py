"""Tests for the 2D style stack: VGG encoder, decoder, transformer,
StyTrans losses, and AdaIN ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.decoder import Decoder, make_decoder
from tgtc.models.stytrans import StyTrans, style_feature_from_tokens
from tgtc.models.transformer import (
    PatchEmbed,
    StyleTransformer,
    TransformerConfig,
)
from tgtc.models.vgg import VggEncoder, ceil_max_pool, make_vgg
from tgtc.ops.style import (
    adaptive_instance_normalization,
    calc_mean_std,
    gram_matrix,
    mean_variance_norm,
)

TINY_CFG = TransformerConfig(
    d_model=64, nhead=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=128, dropout=0.0,
)


class TestVgg:
    def test_pyramid_shapes(self):
        """Default (truncated) parity: the de-facto reference builds StyTrans
        with vgg[:31], so its 5th pyramid level IS relu4_1
        (/root/reference/trans_train.py:113-115)."""
        model, params = make_vgg(jax.random.PRNGKey(0), image_size=64)
        x = jnp.ones((2, 64, 64, 3))
        feats = model.apply(params, x)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (2, 64, 64, 64),
            (2, 32, 32, 128),
            (2, 16, 16, 256),
            (2, 8, 8, 512),
            (2, 8, 8, 512),  # empty enc_5 → same tensor as relu4_1
        ]
        np.testing.assert_array_equal(np.asarray(feats[3]),
                                      np.asarray(feats[4]))

    def test_pyramid_shapes_full(self):
        """truncated=False computes a genuine relu5_1."""
        model = VggEncoder(truncated=False)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        feats = model.apply(params, jnp.ones((2, 64, 64, 3)))
        assert feats[4].shape == (2, 4, 4, 512)

    def test_ceil_max_pool_odd(self):
        x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
        out = ceil_max_pool(x)
        assert out.shape == (1, 3, 3, 1)
        # last row/col preserved via ceil mode
        assert float(out[0, 2, 2, 0]) == 24.0

    def test_torch_weight_conversion(self):
        """Round-trip: identical outputs for torch conv and converted flax conv."""
        import torch

        from tgtc.models.vgg import convert_torch_vgg

        tconv0 = torch.nn.Conv2d(3, 3, 1)
        tconv1 = torch.nn.Conv2d(3, 64, 3)
        sd = {
            "0.weight": tconv0.weight.detach().numpy(),
            "0.bias": tconv0.bias.detach().numpy(),
            "2.weight": tconv1.weight.detach().numpy(),
            "2.bias": tconv1.bias.detach().numpy(),
        }
        converted = convert_torch_vgg(sd)
        model, params = make_vgg(jax.random.PRNGKey(0), image_size=8)
        p = jax.tree.map(lambda x: x, params)  # copy
        p["params"]["conv0"] = converted["params"]["conv0"]
        p["params"]["conv1_1"] = converted["params"]["conv1_1"]

        x = np.random.default_rng(0).uniform(size=(1, 8, 8, 3)).astype(np.float32)
        feats = model.apply(p, jnp.asarray(x))
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            ref = torch.relu(tconv1(torch.nn.functional.pad(
                tconv0(tx), (1, 1, 1, 1), mode="reflect"
            )))
        np.testing.assert_allclose(
            np.asarray(feats[0]), ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5,
        )


class TestDecoder:
    def test_upsamples_8x(self):
        model, params = make_decoder(jax.random.PRNGKey(0), size=4)
        out = model.apply(params, jnp.ones((2, 4, 4, 512)))
        assert out.shape == (2, 32, 32, 3)


class TestTransformer:
    def test_patch_embed(self):
        pe = PatchEmbed(embed_dim=64)
        params = pe.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
        out = pe.apply(params, jnp.ones((2, 32, 32, 3)))
        assert out.shape == (2, 4, 4, 64)

    def test_transformer_shapes(self):
        model = StyleTransformer(TINY_CFG)
        s = jnp.ones((2, 4, 4, 64))
        c = jnp.ones((2, 4, 4, 64))
        params = model.init(jax.random.PRNGKey(0), s, c)
        out = model.apply(params, s, c)
        assert out.shape == (2, 4, 4, 64)

    def test_content_dependence(self):
        """Different content → different output (cross-attn actually wired)."""
        model = StyleTransformer(TINY_CFG)
        key = jax.random.PRNGKey(0)
        s = jax.random.normal(key, (1, 4, 4, 64))
        c1 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 64))
        c2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 64))
        params = model.init(key, s, c1)
        o1 = model.apply(params, s, c1)
        o2 = model.apply(params, s, c2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestStyTrans:
    @pytest.fixture(scope="class")
    def net(self):
        from tgtc.models.stytrans import make_stytrans

        return make_stytrans(jax.random.PRNGKey(0), TINY_CFG, image_size=32)

    def test_stylize_shapes(self, net):
        model, params = net
        c = jnp.ones((1, 32, 32, 3)) * 0.3
        s = jnp.ones((1, 32, 32, 3)) * 0.7
        ics, hs = model.apply(params, c, s, method=model.stylize)
        assert ics.shape == (1, 32, 32, 3)
        assert hs.shape == (1, 4, 4, TINY_CFG.d_model)

    def test_losses_finite_and_identity_zero_at_fixpoint(self, net):
        model, params = net
        key = jax.random.PRNGKey(3)
        c = jax.random.uniform(key, (1, 32, 32, 3))
        s = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
        out = model.apply(
            params, c, s, True, method=model.compute_losses,
        )
        for k in ["loss_c", "loss_s", "l_id1", "l_id2"]:
            assert np.isfinite(float(out[k])), k
        assert out["ics"].shape == c.shape

    def test_style_feature_dim(self):
        hs = jnp.ones((2, 4, 4, 512))
        f = style_feature_from_tokens(hs)
        assert f.shape == (2, 1024)


class TestAdain:
    def test_adain_transfers_stats(self):
        key = jax.random.PRNGKey(0)
        c = jax.random.normal(key, (2, 8, 8, 4)) * 3.0 + 1.0
        s = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)) * 0.5 - 2.0
        out = adaptive_instance_normalization(c, s)
        om, os_ = calc_mean_std(out)
        sm, ss = calc_mean_std(s)
        np.testing.assert_allclose(np.asarray(om), np.asarray(sm), atol=1e-4)
        np.testing.assert_allclose(np.asarray(os_), np.asarray(ss), atol=1e-3)

    def test_mean_variance_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8)) * 5 + 3
        n = mean_variance_norm(x)
        m, s = calc_mean_std(n)
        np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-3)

    def test_gram_shape(self):
        x = jnp.ones((2, 4, 4, 8))
        g = gram_matrix(x)
        assert g.shape == (2, 8, 8)
