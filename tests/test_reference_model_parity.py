"""Parity against the ACTUAL reference torch ``StyleNerf`` module
(/root/reference/models.py:182-223) — not an in-test reimplementation:
identical weights via the converter, identical inputs, matching outputs
through embedding + trunk + heads, coarse AND asymmetric fine. This (with
the per-op brute-force tests for sampling/compositing and the full-StyTrans
parity suite) grounds the 'PSNR within 0.1 dB of the reference' north star
without the real LLFF data."""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def _args(**kw):
    d = dict(use_viewdir=True, act_type="relu", embed_freq_coor=10,
             embed_freq_dir=4, netdepth=8, netwidth=256, netdepth_fine=8,
             netwidth_fine=256, siren_sigma_mul=0.0)
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.mark.parametrize("mode,depth,width", [
    ("coarse", 4, 64),
    ("fine", 6, 32),   # asymmetric fine dims
])
def test_stylenerf_forward_matches(mode, depth, width):
    import models as ref_models

    from tgtc.models.nerf import NerfConfig, make_nerf, nerf_apply
    from tgtc.models.torch_compat import convert_torch_nerf

    torch.manual_seed(3)
    args = _args(netdepth=4, netwidth=64, netdepth_fine=6, netwidth_fine=32,
                 embed_freq_coor=4, embed_freq_dir=2)
    tmodel = ref_models.StyleNerf(args, mode=mode)
    tmodel.eval()

    params = convert_torch_nerf(tmodel.state_dict(), depth=depth)
    cfg = NerfConfig(depth=depth, width=width, embed_freq_coor=4,
                     embed_freq_dir=2, use_viewdir=True,
                     compute_dtype=jnp.float32)
    model, _ = make_nerf(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (64, 8, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 8, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    with torch.no_grad():
        ref = tmodel(pts=torch.from_numpy(pts), dirs=torch.from_numpy(dirs))

    out = nerf_apply(model, params, jnp.asarray(pts), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out["rgb"]), ref["rgb"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["sigma"]), ref["sigma"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["base_remap"]), ref["base_remap"].numpy(),
        rtol=1e-4, atol=1e-4)
    # the embedded pts the style field hooks into
    np.testing.assert_allclose(
        np.asarray(out["pts_embed"]), ref["pts"].numpy(),
        rtol=1e-5, atol=1e-6)


def test_style_mlps_match_reference_modules():
    """The ACTUAL reference StyleMLP_before_concat + StyleMLP_Wild_multilayers
    (/root/reference/models.py:120-180) vs the converted flax pair, through
    the exact Phase-E wiring (concat order, per-layer latent re-injection,
    scalar-mean broadcast)."""
    import models as ref_models

    from tgtc.models.style_field import StyleFieldConfig, make_style_mlps
    from tgtc.models.torch_compat import convert_torch_style_mlps

    torch.manual_seed(4)
    # the reference hardcodes 256+256 feature inputs in the style MLP
    # (/root/reference/models.py:153) — test at its native width
    args = argparse.Namespace(netwidth=256, vae_latent=8, style_D=4,
                              embed_freq_coor=4)
    in_ch = 3 + 6 * 4
    tconcat = ref_models.StyleMLP_before_concat(args)
    tstyle = ref_models.StyleMLP_Wild_multilayers(args)
    tconcat.eval(), tstyle.eval()

    conv = convert_torch_style_mlps(tconcat.state_dict(), tstyle.state_dict())
    field = StyleFieldConfig(style_d=4, width=256, latent_dim=8,
                             embed_dim=in_ch)
    cmod, _, smod, _ = make_style_mlps(field, jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    n = 32
    x = rng.normal(size=(n, in_ch)).astype(np.float32)
    latent = rng.normal(size=(n, 8)).astype(np.float32)
    base_remap = rng.normal(size=(n, 256)).astype(np.float32)

    with torch.no_grad():
        tc = tconcat(x=torch.from_numpy(x), latent=torch.from_numpy(latent))
        concat_feats_ref = tc["concat_features"].numpy()
        concated = torch.cat(
            [torch.from_numpy(base_remap), tc["concat_features"]], dim=-1)
        lat_mean = torch.from_numpy(latent).mean(dim=1, keepdims=True)
        lat_b = lat_mean.expand(n, 8)
        ts = tstyle(x=torch.from_numpy(x), concated=concated, latent=lat_b)
        rgb_ref = ts["rgb"].numpy()

    cf = cmod.apply(conv["concat"], jnp.asarray(x), jnp.asarray(latent))
    np.testing.assert_allclose(np.asarray(cf), concat_feats_ref,
                               rtol=1e-4, atol=1e-5)
    rgb = smod.apply(
        conv["style"], jnp.asarray(x),
        jnp.concatenate([jnp.asarray(base_remap), cf], axis=-1),
        jnp.asarray(np.asarray(lat_b)),
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref,
                               rtol=1e-4, atol=1e-5)
