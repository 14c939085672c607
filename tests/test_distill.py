"""Distilled proposal MLP (render.distill + renderer ``proposal`` wiring).

The reference's coarse network exists only to steer fine sampling
(/root/reference/rendering.py:27-36); after Phase A the density is frozen,
so tgtc distills it once per checkpoint into a tiny MXU-shaped trunk and
uses that as the proposal — the TPU-native alternative to the measured-
negative voxel grid (BASELINE.md round 5). These tests pin the regression
itself, the conservative (expectile) bias direction, the renderer
composition, and sharded equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig
from tgtc.ops.pallas.nerf_mlp import pack_nerf_params
from tgtc.render.distill import distill_proposal, proposal_config
from tgtc.render.fast import FusedNerfRenderer
from tgtc.render.volume import RenderSettings

FINE_CFG = NerfConfig(depth=2, width=32, embed_freq_coor=4,
                      embed_freq_dir=2, compute_dtype=jnp.float32)
SETTINGS = RenderSettings(n_samples=8, n_samples_fine=8,
                          sigma_noise_std=0.0)


def _trained_fine(steps=200):
    from tests.test_train_nerf import TINY_NERF, TINY_TRAIN, _toy_rays
    from tgtc.train.nerf_trainer import init_state, make_train_step

    cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
    ro, rd, rgb = _toy_rays(n=512)
    if steps:
        step = make_train_step(cm, fm, TINY_TRAIN)
        k = jax.random.PRNGKey(2)
        for _ in range(steps):
            state, _ = step(state, ro, rd, rgb, k)
    return state, ro, rd


def _distill(state, ro, rd, **kw):
    kw.setdefault("depth", 2)
    kw.setdefault("width", 32)
    kw.setdefault("steps", 150)
    kw.setdefault("batch", 1024)
    kw.setdefault("lr", 5e-3)
    return distill_proposal(
        jax.random.PRNGKey(7), FINE_CFG, state.params_fine,
        ro, rd, 0.0, 1.0, **kw)


class TestRegression:
    def test_loss_decreases_and_bias_conservative(self):
        """The expectile regression (tau=0.85 — opt-in; the measured
        default is symmetric, see module docstring) must actually fit
        (final loss well under the trivial zero-predictor's) and must not
        bias relu-sigma LOW (the expensive direction)."""
        state, ro, rd = _trained_fine()
        _, stats = _distill(state, ro, rd, steps=300, tau=0.85)
        # trivial predictor baseline: loss of predicting 0 everywhere
        from tgtc.models.nerf import NerfMLP
        from tgtc.ops.encoding import positional_encoding

        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        idx = jax.random.randint(k1, (2048,), 0, ro.shape[0])
        t = jax.random.uniform(k2, (2048, 1))
        pts = ro[idx] + t * rd[idx]
        de = positional_encoding(jnp.zeros((2048, 3)), 2)
        tgt = NerfMLP(FINE_CFG).apply(
            state.params_fine, positional_encoding(pts, 4), de)["sigma"]
        w = jnp.where(tgt > 0, 0.85, 0.15)
        zero_loss = float(jnp.mean(w * tgt * tgt))
        assert stats["loss"] < 0.5 * zero_loss, (stats, zero_loss)
        assert stats["relu_sigma_bias"] > -0.5, stats

    def test_proposal_config_follows_fine_encoding(self):
        cfg = proposal_config(FINE_CFG, depth=3, width=16)
        assert cfg.depth == 3 and cfg.width == 16
        assert cfg.embed_freq_coor == FINE_CFG.embed_freq_coor
        assert cfg.embed_freq_dir == FINE_CFG.embed_freq_dir

    def test_bad_tau_rejected(self):
        state, ro, rd = _trained_fine(steps=0)
        with pytest.raises(ValueError, match="tau"):
            _distill(state, ro, rd, tau=0.3, steps=1)


class TestProposalRender:
    def _renderer(self, coarse_params, state, depth, width, **kw):
        return FusedNerfRenderer.from_params(
            coarse_params, state.params_fine, SETTINGS,
            depth=depth, num_freq_coor=4, num_freq_dir=2, width=width,
            depth_fine=2, width_fine=32,
            tile=128, interpret=True, coarse_rgb=False, **kw,
        )

    def test_render_composes_with_budget_and_share(self):
        state, ro, rd = _trained_fine(steps=0)
        prop, _ = _distill(state, ro, rd, width=16, steps=20)
        out = self._renderer(prop, state, 2, 16, fine_budget=12,
                             coarse_share=2).render(ro[:128], rd[:128])
        assert out["rgb"].shape == (128, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()

    @pytest.mark.slow
    def test_trained_scene_distill_matches_exact(self):
        """On an overfit toy field the distill-proposed render must agree
        with the exact coarse-MLP render to high PSNR: the proposal only
        steers fine sampling, and a W32 trunk distilled from THE SAME
        density resolves this field."""
        state, ro, rd = _trained_fine(steps=200)
        prop, _ = _distill(state, ro, rd, steps=400)
        exact = self._renderer(state.params_coarse, state, 2, 32).render(
            ro[:256], rd[:256])
        dist = self._renderer(prop, state, 2, 32).render(ro[:256], rd[:256])
        a = np.clip(np.asarray(exact["rgb"]), 0, 1)
        b = np.clip(np.asarray(dist["rgb"]), 0, 1)
        agree = -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)
        assert agree > 30.0, f"distilled render diverges: {agree:.1f} dB"

    def test_sharded_equals_single_device(self, cpu_mesh8):
        """Distilled proposal under shard_map: the proposal is just coarse
        params with different dims — replicated like any weights. 8-way
        must equal single-device."""
        from tgtc.render.fast import (
            make_fused_render_fn, make_sharded_fused_render_fn,
        )

        state, ro, rd = _trained_fine(steps=0)
        prop, _ = _distill(state, ro, rd, width=16, steps=20)
        pkw_p = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=16)
        pkw_f = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=32)
        pc = pack_nerf_params(prop, **pkw_p)
        pf = pack_nerf_params(state.params_fine, **pkw_f)
        kw = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=16,
                  depth_fine=2, width_fine=32, tile=16, interpret=True,
                  coarse_rgb=False, fine_budget=12, coarse_share=2)
        single = make_fused_render_fn(SETTINGS, **kw)(
            *pc, *pf, ro[:256], rd[:256])
        sharded = make_sharded_fused_render_fn(SETTINGS, cpu_mesh8, **kw)(
            *pc, *pf, ro[:256], rd[:256])
        for k in single:
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]),
                atol=1e-6, err_msg=k)


class TestStyleProposal:
    def _style_renderer(self, proposal=None, sigma_grid=None, **kw):
        from tgtc.models.nerf import make_nerf
        from tgtc.models.style_field import (
            StyleFieldConfig, init_latents, make_style_mlps,
        )
        from tgtc.render.fast_style import FusedStyleRenderer

        key = jax.random.PRNGKey(20)
        nerf_cfg = NerfConfig(depth=2, width=64, embed_freq_coor=4,
                              embed_freq_dir=2)
        _, npc = make_nerf(nerf_cfg, key)
        _, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        field = StyleFieldConfig(style_d=2, width=64, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        _, pc, _, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
        lat = init_latents(jax.random.fold_in(key, 3), 1, 4, 8)
        return FusedStyleRenderer.from_params(
            npc, npf, pc, ps, lat,
            RenderSettings(n_samples=4, n_samples_fine=4,
                           sigma_noise_std=0.0),
            depth=2, num_freq_coor=4, style_d=2, style_width=64,
            latent_dim=8, trunk_width=64, tile=16, interpret=True,
            llff_tile=False, coarse_rgb=False, proposal=proposal,
            sigma_grid=sigma_grid, **kw,
        )

    def test_style_render_with_proposal_runs_sane(self):
        from tgtc.models.nerf import make_nerf

        prop_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=4,
                              embed_freq_dir=2)
        _, prop = make_nerf(prop_cfg, jax.random.PRNGKey(30))
        rend = self._style_renderer(proposal=(prop, 2, 16, 2),
                                    fine_budget=6, coarse_share=2)
        ro = jax.random.uniform(jax.random.PRNGKey(31), (64, 3))
        rd = jax.random.normal(jax.random.PRNGKey(32), (64, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        sid = jnp.zeros(64, jnp.int32)
        fid = jnp.ones(64, jnp.int32)
        out = rend.render(ro, rd, sid, fid, jax.random.PRNGKey(33))
        rgb = np.asarray(out["rgb"])
        assert rgb.shape == (64, 3) and np.isfinite(rgb).all()
        assert np.all((rgb >= 0.0) & (rgb <= 1.0))

    def test_style_validation_errors(self):
        from tgtc.render.fast_style import make_fused_style_render_fn
        from tgtc.render.grid import GridSpec

        dims = dict(depth=2, width=16, num_freq_coor=4)
        with pytest.raises(ValueError, match="coarse_rgb"):
            make_fused_style_render_fn(SETTINGS, coarse_rgb=True,
                                       proposal_dims=dims)
        with pytest.raises(ValueError, match="pick one"):
            make_fused_style_render_fn(
                SETTINGS, coarse_rgb=False, proposal_dims=dims,
                grid_spec=GridSpec(lo=(0, 0, 0), hi=(1, 1, 1)))
