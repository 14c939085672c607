"""Fused stylized-point kernel vs the XLA style chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig, make_nerf, nerf_apply
from tgtc.models.style_field import StyleFieldConfig, make_style_mlps
from tgtc.ops.pallas.style_kernel import fused_style_apply_t, pack_style_params


@pytest.mark.parametrize("width,style_d", [(256, 8), (128, 8)])
def test_fused_style_matches_xla(width, style_d):
    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()  # depth 8, width 256, freq 10
    model, nerf_params = make_nerf(nerf_cfg, key)
    field = StyleFieldConfig(style_d=style_d, width=width, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    cm, p_concat, sm, p_style = make_style_mlps(field, jax.random.fold_in(key, 1))

    packed = pack_style_params(
        nerf_params, p_concat, p_style,
        depth=nerf_cfg.depth, num_freq_coor=nerf_cfg.embed_freq_coor,
        style_d=style_d, style_width=width, latent_dim=32,
    )

    p = 256
    pts = jax.random.uniform(jax.random.fold_in(key, 2), (p, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.fold_in(key, 3), (p, 32)) * 0.3

    rgb_t, sigma_t = fused_style_apply_t(
        *packed, pts.T, lat.T,
        depth=nerf_cfg.depth, num_freq_coor=nerf_cfg.embed_freq_coor,
        style_d=style_d, style_width=width, latent_dim=32,
        tile=128, interpret=True,
    )

    # XLA reference chain (mirrors tgtc.render.style.style_forward per-point)
    dirs = jnp.ones((p, 3))
    out = nerf_apply(model, nerf_params, pts, dirs)
    cf = cm.apply(p_concat, out["pts_embed"], lat)
    concated = jnp.concatenate([out["base_remap"], cf], axis=-1)
    lat_scalar = jnp.broadcast_to(jnp.mean(lat, -1, keepdims=True), lat.shape)
    rgb_ref = sm.apply(p_style, out["pts_embed"], concated, lat_scalar)

    np.testing.assert_allclose(
        np.asarray(rgb_t.T), np.asarray(rgb_ref), atol=4e-2
    )
    np.testing.assert_allclose(
        np.asarray(sigma_t[0]), np.asarray(out["sigma"]), atol=2e-1
    )


@pytest.mark.slow
def test_fused_style_render_pipeline_coarse_parity():
    """Full fused stylized render (coarse stream) vs the XLA style chain
    with identical sampling keys."""
    from tgtc.models.style_field import init_latents
    from tgtc.ops.sampling import sample_along_rays_uniform
    from tgtc.render.fast_style import FusedStyleRenderer
    from tgtc.render.style import style_forward
    from tgtc.render.volume import RenderSettings
    from tgtc.models.nerf import NerfMLP

    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()
    model, npc = make_nerf(nerf_cfg, key)
    _, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    cm, pc, sm, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
    lat = init_latents(jax.random.fold_in(key, 3), 1, 4, 32)
    rend = FusedStyleRenderer.from_params(
        npc, npf, pc, ps, lat,
        RenderSettings(n_samples=8, n_samples_fine=8, sigma_noise_std=0.0),
        tile=128, interpret=True, llff_tile=False,
    )
    ro = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(key, (64, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    sid = jnp.zeros(64, jnp.int32)
    fid = jnp.ones(64, jnp.int32)
    rkey = jax.random.PRNGKey(7)
    out = rend.render(ro, rd, sid, fid, rkey)

    _, ts = sample_along_rays_uniform(ro, rd, 8, near=0.0, far=1.0, key=rkey)
    comp_c, _ = style_forward(model, npc, cm, pc, sm, ps, lat, ro, rd, ts,
                              sid, fid, llff_tile=False)
    np.testing.assert_allclose(
        np.asarray(out["rgb_coarse"]), np.asarray(comp_c.rgb), atol=5e-2
    )


def test_sigma_only_coarse_identical_fine():
    """coarse_rgb=False (sigma-only trunk kernel for the coarse pass)
    must give the BITWISE-identical fine image: same sigma → same
    weights → same sample_pdf → same fine pass."""
    from tgtc.models.style_field import init_latents
    from tgtc.render.fast_style import FusedStyleRenderer
    from tgtc.render.volume import RenderSettings

    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()
    _, npc = make_nerf(nerf_cfg, key)
    _, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    _, pc, _, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
    lat = init_latents(jax.random.fold_in(key, 3), 1, 4, 32)
    mk = lambda cr: FusedStyleRenderer.from_params(
        npc, npf, pc, ps, lat,
        RenderSettings(n_samples=8, n_samples_fine=8, sigma_noise_std=0.0),
        tile=128, interpret=True, llff_tile=False, coarse_rgb=cr,
    )
    ro = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(key, (64, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    sid = jnp.zeros(64, jnp.int32)
    fid = jnp.ones(64, jnp.int32)
    rkey = jax.random.PRNGKey(7)
    out_full = mk(True).render(ro, rd, sid, fid, rkey)
    out_sig = mk(False).render(ro, rd, sid, fid, rkey)
    assert "rgb_coarse" not in out_sig
    np.testing.assert_array_equal(np.asarray(out_full["rgb"]),
                                  np.asarray(out_sig["rgb"]))
    np.testing.assert_array_equal(np.asarray(out_full["t_exp"]),
                                  np.asarray(out_sig["t_exp"]))


@pytest.mark.slow
def test_fused_style_non_default_trunk():
    """Regression: pack_style_params once assumed a 256-wide trunk."""
    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig(depth=4, width=64, embed_freq_coor=4,
                          embed_freq_dir=2, skips=(2,))
    model, nerf_params = make_nerf(nerf_cfg, key)
    field = StyleFieldConfig(style_d=4, width=64, latent_dim=8,
                             embed_dim=nerf_cfg.input_ch, skip=2)
    cm, p_concat, sm, p_style = make_style_mlps(field, jax.random.fold_in(key, 1))
    packed = pack_style_params(
        nerf_params, p_concat, p_style, depth=4, num_freq_coor=4, skip=2,
        style_d=4, style_width=64, latent_dim=8, trunk_width=64,
    )
    p = 128
    pts = jax.random.uniform(jax.random.fold_in(key, 2), (p, 3))
    lat = jax.random.normal(jax.random.fold_in(key, 3), (p, 8)) * 0.3
    rgb_t, sigma_t = fused_style_apply_t(
        *packed, pts.T, lat.T, depth=4, skip=2, num_freq_coor=4,
        style_d=4, style_width=64, latent_dim=8, trunk_width=64,
        tile=128, interpret=True,
    )
    out = nerf_apply(model, nerf_params, pts, jnp.ones((p, 3)))
    cf = cm.apply(p_concat, out["pts_embed"], lat)
    concated = jnp.concatenate([out["base_remap"], cf], axis=-1)
    lat_scalar = jnp.broadcast_to(jnp.mean(lat, -1, keepdims=True), lat.shape)
    rgb_ref = sm.apply(p_style, out["pts_embed"], concated, lat_scalar)
    np.testing.assert_allclose(np.asarray(rgb_t.T), np.asarray(rgb_ref),
                               atol=4e-2)
    np.testing.assert_allclose(np.asarray(sigma_t[0]),
                               np.asarray(out["sigma"]), atol=2e-1)


@pytest.mark.slow
def test_style_fine_budget_runs_and_full_budget_identity():
    """Early ray termination on the stylized path: full budget takes the
    exact path; a mid budget produces finite, sane outputs (the selection
    math itself is pinned in tests/test_fine_budget.py)."""
    from tgtc.models.style_field import init_latents
    from tgtc.render.fast_style import FusedStyleRenderer
    from tgtc.render.volume import RenderSettings

    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()
    _, npc = make_nerf(nerf_cfg, key)
    _, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    _, pc, _, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
    lat = init_latents(jax.random.fold_in(key, 3), 1, 4, 32)
    mk = lambda budget: FusedStyleRenderer.from_params(
        npc, npf, pc, ps, lat,
        RenderSettings(n_samples=8, n_samples_fine=8, sigma_noise_std=0.0),
        tile=128, interpret=True, llff_tile=False, coarse_rgb=False,
        fine_budget=budget,
    )
    ro = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(key, (64, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    sid = jnp.zeros(64, jnp.int32)
    fid = jnp.ones(64, jnp.int32)
    rkey = jax.random.PRNGKey(7)
    out_none = mk(None).render(ro, rd, sid, fid, rkey)
    out_b16 = mk(16).render(ro, rd, sid, fid, rkey)  # == nc+nf
    np.testing.assert_array_equal(np.asarray(out_none["rgb"]),
                                  np.asarray(out_b16["rgb"]))
    out_b12 = mk(12).render(ro, rd, sid, fid, rkey)
    rgb = np.asarray(out_b12["rgb"])
    assert rgb.shape == (64, 3) and np.all(np.isfinite(rgb))
    assert np.all((rgb >= 0.0) & (rgb <= 1.0))
