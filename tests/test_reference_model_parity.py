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


def test_full_render_psnr_vs_torch_reference():
    """End-to-end full-render parity: our jitted render pipeline vs an
    INDEPENDENT torch+numpy composition (actual reference StyleNerf modules
    for both networks, numpy brute-force quadrature, numpy searchsorted
    inverse-CDF). Identical converted weights, deterministic sampling.
    Grounds the 'PSNR within 0.1 dB' north star with a direct number —
    anything above ~30 dB difference-PSNR implies sub-0.1 dB render drift.
    """
    import models as ref_models

    from tgtc.models.nerf import NerfConfig
    from tgtc.models.torch_compat import convert_torch_nerf
    from tgtc.train.nerf_trainer import (
        NerfTrainConfig, init_state, make_render_fn,
    )

    torch.manual_seed(11)
    args = _args(netdepth=4, netwidth=64, netdepth_fine=4, netwidth_fine=64,
                 embed_freq_coor=4, embed_freq_dir=2)
    t_coarse = ref_models.StyleNerf(args, mode="coarse").eval()
    t_fine = ref_models.StyleNerf(args, mode="fine").eval()

    pc = convert_torch_nerf(t_coarse.state_dict(), depth=4)
    pf = convert_torch_nerf(t_fine.state_dict(), depth=4)
    ncfg = NerfConfig(depth=4, width=64, embed_freq_coor=4, embed_freq_dir=2,
                      use_viewdir=True, compute_dtype=jnp.float32)
    tcfg = NerfTrainConfig(n_samples=8, n_samples_fine=8,
                           sigma_noise_std=0.0, near=0.1, far=2.0)
    cm, fm, state = init_state(jax.random.PRNGKey(0), ncfg, tcfg)
    state = state.replace(params_coarse=pc, params_fine=pf)

    # one 16x16 pinhole view
    h = w = 16
    focal = 20.0
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(ii - w / 2) / focal, -(jj - h / 2) / focal,
                     -np.ones_like(ii)], -1).astype(np.float32)
    ro = np.zeros((h * w, 3), np.float32)
    rd = dirs.reshape(-1, 3)

    render_fn = make_render_fn(cm, fm, tcfg)
    ours = np.asarray(render_fn(pc, pf, jnp.asarray(ro), jnp.asarray(rd))["rgb"])

    # --- independent torch+numpy pipeline ---
    def brute_composite(rgb, sigma, t):
        r, n, _ = rgb.shape
        delta = np.concatenate(
            [t[:, 1:] - t[:, :-1], np.full((r, 1), 1e10, np.float32)], 1)
        alpha = 1.0 - np.exp(-np.maximum(sigma, 0.0) * delta)
        trans = np.cumprod(
            np.concatenate([np.ones((r, 1), np.float32),
                            1.0 - alpha + 1e-10], 1), axis=1)[:, :-1]
        wts = alpha * trans
        return (wts[..., None] * rgb).sum(1), wts

    n_c = 8
    ts = np.broadcast_to(
        np.linspace(0.1, 2.0, n_c, dtype=np.float32), (h * w, n_c)).copy()
    pts = ro[:, None] + ts[..., None] * rd[:, None]
    d_b = np.broadcast_to(rd[:, None], pts.shape).copy()
    with torch.no_grad():
        out_c = t_coarse(pts=torch.from_numpy(pts), dirs=torch.from_numpy(d_b))
    rgb_b, wts = brute_composite(out_c["rgb"].numpy(), out_c["sigma"].numpy(),
                                 ts)

    # inverse-CDF resample, independent numpy searchsorted
    bins = 0.5 * (ts[:, 1:] + ts[:, :-1])
    w_mid = wts[:, 1:-1] + 1e-5
    pdf = w_mid / w_mid.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((h * w, 1), np.float32),
                          np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, 8, dtype=np.float32),
                        (h * w, 8))
    t_new = np.empty((h * w, 8), np.float32)
    for i in range(h * w):
        idx = np.searchsorted(cdf[i], u[i], side="right")
        below = np.clip(idx - 1, 0, cdf.shape[1] - 1)
        above = np.clip(idx, 0, cdf.shape[1] - 1)
        denom = cdf[i][above] - cdf[i][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        frac = (u[i] - cdf[i][below]) / denom
        t_new[i] = bins[i][below] + frac * (bins[i][above] - bins[i][below])
    ts_f = np.sort(np.concatenate([ts, t_new], -1), -1)
    pts_f = ro[:, None] + ts_f[..., None] * rd[:, None]
    d_f = np.broadcast_to(rd[:, None], pts_f.shape).copy()
    with torch.no_grad():
        out_f = t_fine(pts=torch.from_numpy(pts_f), dirs=torch.from_numpy(d_f))
    rgb_ref, _ = brute_composite(out_f["rgb"].numpy(), out_f["sigma"].numpy(),
                                 ts_f)

    mse = float(np.mean((ours - rgb_ref) ** 2))
    psnr = -10 * np.log10(mse + 1e-20)
    print(f"full-render cross-framework difference PSNR: {psnr:.1f} dB")
    assert psnr > 50.0, psnr
