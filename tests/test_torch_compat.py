"""Numerical equivalence tests: torch reference modules vs converted flax
params (the weight-compatibility contract for the published pretrained
assets)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tgtc.models.torch_compat import (
    convert_torch_nerf,
    convert_torch_patch_embed,
    convert_torch_transformer,
    convert_torch_vae,
)


class TestMhaEquivalence:
    def test_multihead_attention_matches_torch(self):
        """Our MultiHeadAttention with converted in_proj/out_proj must match
        torch.nn.MultiheadAttention exactly (dropout off)."""
        from tgtc.models.torch_compat import _mha
        from tgtc.models.transformer import MultiHeadAttention

        d, heads, n, b = 16, 4, 6, 2
        tm = torch.nn.MultiheadAttention(d, heads, dropout=0.0)
        tm.eval()
        sd = {f"attn.{k}": v for k, v in tm.state_dict().items()}
        params = {"params": _mha("attn", sd)}

        rng = np.random.default_rng(0)
        q = rng.normal(size=(n, b, d)).astype(np.float32)
        k = rng.normal(size=(n, b, d)).astype(np.float32)
        v = rng.normal(size=(n, b, d)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tm(torch.from_numpy(q), torch.from_numpy(k),
                        torch.from_numpy(v))
        model = MultiHeadAttention(d, heads, 0.0)
        # ours is [B, N, C]
        out = model.apply(
            params,
            jnp.asarray(q.transpose(1, 0, 2)),
            jnp.asarray(k.transpose(1, 0, 2)),
            jnp.asarray(v.transpose(1, 0, 2)),
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy().transpose(1, 0, 2),
            rtol=1e-4, atol=1e-5,
        )


class TestPatchEmbed:
    def test_matches_torch_conv(self):
        from tgtc.models.transformer import PatchEmbed

        tconv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=4)
        sd = {"proj.weight": tconv.weight, "proj.bias": tconv.bias}
        params = convert_torch_patch_embed(sd)
        x = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
        out = PatchEmbed(embed_dim=8, patch_size=4).apply(
            params, jnp.asarray(x)
        )
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5,
        )


class TestVaeConversion:
    def test_encoder_matches(self):
        from tgtc.models.vae import Vae, VaeConfig

        # tiny torch VAE mirroring the reference structure
        class TEnc(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc_layers = torch.nn.ModuleList(
                    [torch.nn.Linear(12, 10), torch.nn.Linear(10, 10)]
                )
                self.fc_layer_mu = torch.nn.Linear(10, 4)
                self.fc_layer_log_var = torch.nn.Linear(10, 4)

        class TDec(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc_layers = torch.nn.ModuleList(
                    [torch.nn.Linear(4, 10), torch.nn.Linear(10, 10)]
                )
                self.output_layer = torch.nn.Linear(10, 12)

        class TVae(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder, self.decoder = TEnc(), TDec()

        tvae = TVae()
        params = convert_torch_vae(tvae.state_dict(), depth=3)
        model = Vae(VaeConfig(data_dim=12, latent_dim=4, width=10, depth=3))
        x = np.random.default_rng(0).normal(size=(3, 12)).astype(np.float32)
        mu, logvar = model.apply(params, jnp.asarray(x), method=model.encode)

        with torch.no_grad():
            h = torch.from_numpy(x)
            for l in tvae.encoder.fc_layers:
                h = torch.relu(l(h))
            ref_mu = tvae.encoder.fc_layer_mu(h)
        np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestNerfConversion:
    def test_full_trunk_matches_torch(self):
        """Build the reference MLP structure in torch, convert, compare."""
        from tgtc.models.nerf import NerfConfig, NerfMLP

        D, W, in_c, in_d = 4, 16, 15, 9
        torch.manual_seed(0)

        base, dim = [], in_c
        skips = [2]
        for i in range(D):
            base.append(torch.nn.Linear(dim, W))
            dim = W
            if i in skips and i != D - 1:
                dim += in_c
        sigma = torch.nn.Linear(dim, 1)
        remap = torch.nn.Linear(dim, 256)
        rgb0 = torch.nn.Linear(256 + in_d, W // 2)
        rgb1 = torch.nn.Linear(W // 2, 3)

        sd = {}
        for i, l in enumerate(base):
            sd[f"base_layers.{i}.weight"] = l.weight
            sd[f"base_layers.{i}.bias"] = l.bias
        sd["sigma_layer.weight"], sd["sigma_layer.bias"] = sigma.weight, sigma.bias
        sd["base_remap_layer.weight"] = remap.weight
        sd["base_remap_layer.bias"] = remap.bias
        sd["rgb_layers.0.weight"], sd["rgb_layers.0.bias"] = rgb0.weight, rgb0.bias
        sd["rgb_layers.1.weight"], sd["rgb_layers.1.bias"] = rgb1.weight, rgb1.bias

        params = convert_torch_nerf(sd, depth=D)
        cfg = NerfConfig(depth=D, width=W, embed_freq_coor=2, embed_freq_dir=1,
                         skips=(2,), compute_dtype=jnp.float32)
        model = NerfMLP(cfg)

        rng = np.random.default_rng(1)
        pts = rng.normal(size=(5, in_c)).astype(np.float32)
        dirs = rng.normal(size=(5, in_d)).astype(np.float32)
        out = model.apply(params, jnp.asarray(pts), jnp.asarray(dirs))

        with torch.no_grad():
            x = torch.from_numpy(pts)
            h = torch.relu(base[0](x))
            for i in range(D - 1):
                if i in skips:
                    h = torch.cat([x, h], -1)
                h = torch.relu(base[i + 1](h))
            ref_sigma = sigma(h)[:, 0]
            br = torch.relu(remap(h))
            rf = torch.relu(rgb0(torch.cat([br, torch.from_numpy(dirs)], -1)))
            ref_rgb = torch.sigmoid(rgb1(rf))
        np.testing.assert_allclose(np.asarray(out["sigma"]), ref_sigma.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["rgb"]), ref_rgb.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestTransformerConversion:
    def test_shapes_load_into_flax(self):
        """A randomly initialized reference-layout state dict converts and
        produces finite outputs through the flax transformer."""
        from tgtc.models.transformer import (
            StyleTransformer, TransformerConfig,
        )

        d, heads, ff = 16, 2, 32
        cfg = TransformerConfig(d_model=d, nhead=heads, num_encoder_layers=1,
                                num_decoder_layers=1, dim_feedforward=ff,
                                dropout=0.0)
        rng = np.random.default_rng(0)

        def lin(o, i):
            return rng.normal(size=(o, i)).astype(np.float32) * 0.05

        sd = {}
        for enc in ["encoder_s.layers.0", "encoder_c.layers.0"]:
            sd[f"{enc}.qkv.weight"] = lin(3 * d, d)
            sd[f"{enc}.qk.weight"] = lin(2 * d, d)
            sd[f"{enc}.self_attn.in_proj_weight"] = lin(3 * d, d)
            sd[f"{enc}.self_attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
            sd[f"{enc}.self_attn.out_proj.weight"] = lin(d, d)
            sd[f"{enc}.self_attn.out_proj.bias"] = np.zeros(d, np.float32)
            sd[f"{enc}.linear1.weight"] = lin(ff, d)
            sd[f"{enc}.linear1.bias"] = np.zeros(ff, np.float32)
            sd[f"{enc}.linear2.weight"] = lin(d, ff)
            sd[f"{enc}.linear2.bias"] = np.zeros(d, np.float32)
            for n in ["norm1", "norm2"]:
                sd[f"{enc}.{n}.weight"] = np.ones(d, np.float32)
                sd[f"{enc}.{n}.bias"] = np.zeros(d, np.float32)
        dec = "decoder.layers.0"
        for attn in ["self_attn", "multihead_attn"]:
            sd[f"{dec}.{attn}.in_proj_weight"] = lin(3 * d, d)
            sd[f"{dec}.{attn}.in_proj_bias"] = np.zeros(3 * d, np.float32)
            sd[f"{dec}.{attn}.out_proj.weight"] = lin(d, d)
            sd[f"{dec}.{attn}.out_proj.bias"] = np.zeros(d, np.float32)
        sd[f"{dec}.linear1.weight"] = lin(ff, d)
        sd[f"{dec}.linear1.bias"] = np.zeros(ff, np.float32)
        sd[f"{dec}.linear2.weight"] = lin(d, ff)
        sd[f"{dec}.linear2.bias"] = np.zeros(d, np.float32)
        for n in ["norm1", "norm2", "norm3"]:
            sd[f"{dec}.{n}.weight"] = np.ones(d, np.float32)
            sd[f"{dec}.{n}.bias"] = np.zeros(d, np.float32)
        sd["decoder.norm.weight"] = np.ones(d, np.float32)
        sd["decoder.norm.bias"] = np.zeros(d, np.float32)

        params = convert_torch_transformer(sd, 1, 1)
        model = StyleTransformer(cfg)
        s = jnp.asarray(rng.normal(size=(1, 2, 2, d)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(1, 2, 2, d)).astype(np.float32))
        # validate param structure against a fresh init covering all three
        # pos_modes (each encoder layer carries BOTH fused projections)
        import flax.linen as fnn

        def all_modes(mdl, s_, c_):
            for m in ("ics", "icc", "iss"):
                mdl(s_, c_, True, m)

        ref_params = fnn.init(all_modes, model)(jax.random.PRNGKey(0), s, c)
        ref_flat = jax.tree.structure(ref_params)
        got_flat = jax.tree.structure(params)
        assert ref_flat == got_flat, f"{ref_flat}\n!=\n{got_flat}"
        out = model.apply(params, s, c)
        assert np.all(np.isfinite(np.asarray(out)))


class TestReferenceCheckpointLoaders:
    def test_nerf_tar_roundtrip(self, tmp_path):
        """Fabricate a reference-layout .tar and load it."""
        from tgtc.models.torch_compat import load_reference_nerf_checkpoint

        D, W, in_c, in_d = 2, 8, 15, 9
        def mk_sd():
            sd = {}
            dims = [(in_c, W), (W, W)]
            for i, (a, b) in enumerate(dims):
                sd[f"base_layers.{i}.weight"] = torch.randn(b, a)
                sd[f"base_layers.{i}.bias"] = torch.randn(b)
            sd["sigma_layer.weight"] = torch.randn(1, W)
            sd["sigma_layer.bias"] = torch.randn(1)
            sd["base_remap_layer.weight"] = torch.randn(256, W)
            sd["base_remap_layer.bias"] = torch.randn(256)
            sd["rgb_layers.0.weight"] = torch.randn(W // 2, 256 + in_d)
            sd["rgb_layers.0.bias"] = torch.randn(W // 2)
            sd["rgb_layers.1.weight"] = torch.randn(3, W // 2)
            sd["rgb_layers.1.bias"] = torch.randn(3)
            return sd

        p = str(tmp_path / "000123.tar")
        torch.save({"global_step": 123, "model": mk_sd(),
                    "model_fine": mk_sd()}, p)
        step, coarse, fine = load_reference_nerf_checkpoint(p, depth=D)
        assert step == 123
        assert coarse["params"]["base_0"]["kernel"].shape == (in_c, 8)
        assert fine is not None

    def test_latent_tar(self, tmp_path):
        from tgtc.models.torch_compat import load_reference_latent_checkpoint

        sd = {"latents": torch.randn(1, 20, 32),
              "style_latents_mu": torch.randn(1, 32),
              "style_latents_logvar": torch.randn(1, 32)}
        p = str(tmp_path / "latent_000001.tar")
        torch.save({"train_set_1": sd}, p)
        lat = load_reference_latent_checkpoint(p)
        assert lat["latents"].shape == (1, 20, 32)
        assert lat["mu"].shape == (1, 32)


class TestFullTransformerNumericEquivalence:
    """The converted flax StyleTransformer must match the ACTUAL reference
    torch ``Transformer`` numerically — including the fused-qkv
    value-replaces-residual quirk in the style encoder
    (/root/reference/transformer.py:172-177) and the decoder's double
    cross-attention (:245-257)."""

    def _build_ref(self, d=64, heads=4, layers=3, ff=128):
        import sys

        sys.path.insert(0, "/root/reference")
        import transformer as ref_transformer

        t = ref_transformer.Transformer(
            d_model=d, nhead=heads, num_encoder_layers=layers,
            num_decoder_layers=layers, dim_feedforward=ff, dropout=0.0,
        )
        t.eval()
        return t

    def test_full_style_content_path_matches(self):
        """Full style+content → tokens path at 3+3 layers, rtol 1e-4
        (/root/reference/transformer.py:46-75; called with pos_c=content,
        pos_s=None per /root/reference/tctrans.py:204-208)."""
        from tgtc.models.transformer import (
            StyleTransformer, TransformerConfig,
        )

        d, heads, layers, ff = 64, 4, 3, 128
        tref = self._build_ref(d, heads, layers, ff)
        params = convert_torch_transformer(
            tref.state_dict(), num_encoder_layers=layers,
            num_decoder_layers=layers,
        )

        rng = np.random.default_rng(0)
        b, h, w = 2, 4, 4
        style = rng.normal(size=(b, d, h, w)).astype(np.float32)
        content = rng.normal(size=(b, d, h, w)).astype(np.float32)

        with torch.no_grad():
            ts, tc = torch.from_numpy(style), torch.from_numpy(content)
            hs_ref = tref(ts, None, tc, tc, None)  # pos_c=content, pos_s=None

        cfg = TransformerConfig(d_model=d, nhead=heads,
                                num_encoder_layers=layers,
                                num_decoder_layers=layers,
                                dim_feedforward=ff, dropout=0.0)
        model = StyleTransformer(cfg)
        out = model.apply(
            params,
            jnp.asarray(style.transpose(0, 2, 3, 1)),
            jnp.asarray(content.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(out), hs_ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    def test_identity_paths_match(self):
        """The Icc/Iss identity invocations use different pos patterns —
        Icc passes pos on BOTH encoders, Iss none anywhere
        (/root/reference/tctrans.py:219-220). pos_mode must reproduce each."""
        from tgtc.models.transformer import (
            StyleTransformer, TransformerConfig,
        )

        d, heads, layers, ff = 32, 2, 2, 64
        tref = self._build_ref(d, heads, layers, ff)
        params = convert_torch_transformer(
            tref.state_dict(), num_encoder_layers=layers,
            num_decoder_layers=layers,
        )
        cfg = TransformerConfig(d_model=d, nhead=heads,
                                num_encoder_layers=layers,
                                num_decoder_layers=layers,
                                dim_feedforward=ff, dropout=0.0)
        model = StyleTransformer(cfg)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, d, 2, 2)).astype(np.float32)
        tx = torch.from_numpy(x)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))

        with torch.no_grad():
            icc_ref = tref(tx, None, tx, tx, tx)    # pos_c = pos_s = tokens
            iss_ref = tref(tx, None, tx, None, None)  # no pos anywhere

        icc = model.apply(params, xj, xj, True, "icc")
        iss = model.apply(params, xj, xj, True, "iss")
        np.testing.assert_allclose(
            np.asarray(icc), icc_ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(iss), iss_ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
