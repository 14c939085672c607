"""Tests for the 3D style field (style MLPs, latents) and the Phase-E
trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.data.style_dataset import (
    advance_coh_counters,
    gather_coh_batch,
    gather_main_batch,
    synthetic_style_scene,
)
from tgtc.models.nerf import NerfConfig, make_nerf
from tgtc.models.style_field import (
    StyleFieldConfig,
    init_latents,
    latent_minus_logp,
    lookup_latents,
    make_style_mlps,
    set_latents_from_vae,
)
from tgtc.models.vae import VaeConfig, make_vae, vae_loss
from tgtc.train.style3d import (
    StyleTrainConfig,
    init_style_state,
    make_style_train_step,
)

FIELD = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                         embed_dim=15)  # embed_freq 2 → 2*6+3


class TestStyleMlps:
    def test_shapes(self):
        cm, p1, sm, p2 = make_style_mlps(FIELD, jax.random.PRNGKey(0))
        x = jnp.ones((5, FIELD.embed_dim))
        lat = jnp.ones((5, FIELD.latent_dim))
        cf = cm.apply(p1, x, lat)
        assert cf.shape == (5, FIELD.width)
        base_remap = jnp.ones((5, 256))
        rgb = sm.apply(p2, x, jnp.concatenate([base_remap, cf], -1), lat)
        assert rgb.shape == (5, 3)
        assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))

    def test_reference_layer_counts(self):
        """style_D=8 → concat MLP has 5 layers (the reference loop breaks at
        the skip, /root/reference/models.py:127-135), style MLP has 7+out."""
        cfg = StyleFieldConfig()  # D=8
        cm, p1, sm, p2 = make_style_mlps(cfg, jax.random.PRNGKey(0))
        concat_layers = [k for k in p1["params"] if k.startswith("layer")]
        assert len(concat_layers) == 5
        style_layers = [k for k in p2["params"] if k.startswith("layer")]
        assert len(style_layers) == 7
        # skip layer input dims include the re-injected embedding
        assert p1["params"]["layer_4"]["kernel"].shape[0] == (
            cfg.width + cfg.latent_dim + cfg.embed_dim
        )
        assert p2["params"]["layer_0"]["kernel"].shape[0] == (
            cfg.embed_dim + 2 * cfg.width + cfg.latent_dim
        )


class TestLatents:
    def test_lookup_and_shrinkage(self):
        st = init_latents(jax.random.PRNGKey(0), 2, 3, 8)
        sid = jnp.array([0, 1])
        fid = jnp.array([1, 2])
        full = lookup_latents(st, sid, fid, sigma_scale=1.0, llff_tile=False)
        assert full.shape == (2, 8)
        # sigma_scale=0 collapses to mu
        mu_only = lookup_latents(st, sid, fid, sigma_scale=0.0, llff_tile=False)
        np.testing.assert_allclose(
            np.asarray(mu_only), np.asarray(st["mu"][np.asarray(sid)]), rtol=1e-6
        )

    def test_llff_tile_quirk(self):
        """Tiled table: flat ids beyond S*F still index valid rows
        (/root/reference/models.py:496)."""
        st = init_latents(jax.random.PRNGKey(0), 1, 4, 8)
        sid = jnp.zeros(3, jnp.int32)
        fid = jnp.array([0, 3, 3])
        out = lookup_latents(st, sid, fid, llff_tile=True)
        assert out.shape == (3, 8)

    def test_set_from_vae_statistics(self):
        st = init_latents(jax.random.PRNGKey(0), 2, 64, 8)
        mu = jnp.stack([jnp.full(8, 5.0), jnp.full(8, -3.0)])
        logvar = jnp.full((2, 8), -6.0)  # tiny variance
        st2 = set_latents_from_vae(jax.random.PRNGKey(1), st, mu, logvar)
        np.testing.assert_allclose(
            np.asarray(st2["latents"][0].mean()), 5.0, atol=0.1
        )
        np.testing.assert_allclose(
            np.asarray(st2["latents"][1].mean()), -3.0, atol=0.1
        )

    def test_minus_logp_positive(self):
        st = init_latents(jax.random.PRNGKey(0), 2, 3, 8)
        v = latent_minus_logp(st, jnp.array([0]), jnp.array([1]),
                              llff_tile=False)
        assert float(v) >= 0


class TestVae:
    def test_roundtrip_and_loss(self):
        cfg = VaeConfig(data_dim=32, latent_dim=4, width=16, depth=3)
        model, params = make_vae(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 32))
        y, z, mu, logvar = model.apply(params, x, jax.random.PRNGKey(2))
        assert y.shape == x.shape and z.shape == (6, 4)
        loss, parts = vae_loss(x, y, mu, logvar)
        assert np.isfinite(float(loss))
        assert float(parts["kl"]) >= 0

    def test_deterministic_encode_without_key(self):
        cfg = VaeConfig(data_dim=16, latent_dim=4, width=8, depth=2)
        model, params = make_vae(cfg, jax.random.PRNGKey(0))
        x = jnp.ones((2, 16))
        y1, z1, _, _ = model.apply(params, x)
        y2, z2, _, _ = model.apply(params, x)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


class TestCohCounters:
    def test_frame_cycle(self):
        s = jnp.zeros((), jnp.int32)
        f = jnp.zeros((), jnp.int32)
        b = jnp.zeros((), jnp.int32)
        st = jnp.zeros((), jnp.int32)
        frames = []
        for _ in range(7):
            frames.append(int(f))
            s, f, b, st = advance_coh_counters(s, f, b, st, 2, 3, 4, 100)
        # frame walks 0,1,2,0,1,2,... and block advances on wrap
        assert frames == [0, 1, 2, 0, 1, 2, 0]
        assert int(b) == 2

    def test_style_advance_after_exhaustion(self):
        s = jnp.zeros((), jnp.int32)
        f = jnp.asarray(2, jnp.int32)  # last frame
        b = jnp.asarray(5, jnp.int32)
        st = jnp.asarray(100, jnp.int32)  # >= hw
        s2, f2, b2, st2 = advance_coh_counters(s, f, b, st, 2, 3, 4, 100)
        assert int(s2) == 1 and int(f2) == 0 and int(st2) == 0 and int(b2) == 0


class TestStyleTrainStep:
    def test_step_runs_and_losses_finite(self):
        key = jax.random.PRNGKey(0)
        nerf_cfg = NerfConfig(depth=2, width=32, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        data = synthetic_style_scene(key, s=2, f=3, h=8, w=8)
        cfg = StyleTrainConfig(batch_size=16, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic")
        field = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 3)
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)

        losses = []
        for i in range(8):
            state, m = step(state, data, key)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 8
        # after a full frame cycle the coherence loss engages
        state2, m2 = step(state, data, key)
        assert np.isfinite(float(m2["loss_coh"]))

    @pytest.mark.slow
    def test_k_step_scan_matches_sequential(self):
        """k_steps>1 (one lax.scan dispatch) must be bit-identical to the
        same number of sequential single-step calls — the key schedule
        folds state.step inside the step."""
        key = jax.random.PRNGKey(3)
        nerf_cfg = NerfConfig(depth=2, width=32, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        data = synthetic_style_scene(key, s=2, f=3, h=8, w=8)
        cfg = StyleTrainConfig(batch_size=16, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic")
        field = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 3)
        k = 5
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)
        scan = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg,
                                     k_steps=k)

        # both fns donate their state arg — give each its own copy
        state2 = jax.tree.map(jnp.copy, state)

        seq = state
        seq_metrics = []
        for _ in range(k):
            seq, m = step(seq, data, key)
            seq_metrics.append(m)
        chunk, ms = scan(state2, data, key)

        assert int(chunk.step) == int(seq.step) == k
        for name in ("loss", "loss_rgb", "loss_coh"):
            np.testing.assert_array_equal(
                np.asarray(ms[name]),
                np.asarray([m[name] for m in seq_metrics]), err_msg=name,
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            chunk.params, seq.params,
        )
        np.testing.assert_array_equal(np.asarray(chunk.coh_x),
                                      np.asarray(seq.coh_x))

    @pytest.mark.slow
    def test_k_step_scan_under_mesh_matches_sequential(self, cpu_mesh8):
        """Phase E's PRODUCTION DISPATCH SHAPE: K>1 scanned steps per
        dispatch with data-axis sharding (pipeline.train_style3d runs
        K=50 + mesh on TPU), queued two dispatches deep — bit-identical to
        sequential mesh steps."""
        key = jax.random.PRNGKey(3)
        nerf_cfg = NerfConfig(depth=2, width=32, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        data = synthetic_style_scene(key, s=2, f=3, h=8, w=8)
        cfg = StyleTrainConfig(batch_size=16, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic")
        field = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 3)
        k = 4
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg,
                                     mesh=cpu_mesh8)
        scan = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg,
                                     mesh=cpu_mesh8, k_steps=k)
        state2 = jax.tree.map(jnp.copy, state)

        seq = state
        seq_losses = []
        for _ in range(2 * k):
            seq, m = step(seq, data, key)
            seq_losses.append(float(m["loss"]))
        chunk, ms_a = scan(state2, data, key)
        chunk, ms_b = scan(chunk, data, key)  # second dispatch queued
        got = np.concatenate([np.asarray(ms_a["loss"]),
                              np.asarray(ms_b["loss"])])
        np.testing.assert_array_equal(got,
                                      np.asarray(seq_losses, np.float32))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            chunk.params, seq.params,
        )
        assert int(chunk.step) == 2 * k

    @pytest.mark.slow
    def test_nerf_params_not_trained(self):
        """Gradients must not flow into the frozen NeRF (stop_gradient)."""
        key = jax.random.PRNGKey(0)
        nerf_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        data = synthetic_style_scene(key, s=1, f=2, h=4, w=4)
        cfg = StyleTrainConfig(batch_size=8, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic")
        field = StyleFieldConfig(style_d=4, width=16, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 1, 2)
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)
        before = jax.tree.leaves(npc)[0].copy()
        state, _ = step(state, data, key)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(npc)[0]), np.asarray(before)
        )

    def test_latents_and_style_params_update(self):
        key = jax.random.PRNGKey(0)
        nerf_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        data = synthetic_style_scene(key, s=1, f=2, h=4, w=4)
        cfg = StyleTrainConfig(batch_size=8, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic")
        field = StyleFieldConfig(style_d=4, width=16, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 1, 2)
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)
        lat_before = np.asarray(state.params["latents"]).copy()
        style_before = np.asarray(
            jax.tree.leaves(state.params["style"])[0]
        ).copy()
        for i in range(3):
            state, _ = step(state, data, jax.random.fold_in(key, i))
        assert not np.allclose(np.asarray(state.params["latents"]), lat_before)
        assert not np.allclose(
            np.asarray(jax.tree.leaves(state.params["style"])[0]), style_before
        )


class TestCoherenceDiagnostic:
    """Phase-E start coherence-regime diagnostic (VERDICT r3 item 4): the
    reference's fixed lambda_coh schedule silently saturates on high-chroma
    scenes (/root/reference/train_tgtcs.py:482-483 has no check)."""

    def _setup(self, lam):
        key = jax.random.PRNGKey(0)
        nerf_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                              embed_freq_dir=1, compute_dtype=jnp.float32)
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        # synthetic_style_scene's random stylized targets ARE the
        # high-chroma regime (uniform color noise, max chroma contrast)
        data = synthetic_style_scene(key, s=2, f=3, h=8, w=8)
        cfg = StyleTrainConfig(batch_size=16, n_samples=4, n_samples_fine=4,
                               sigma_noise_std=0.0, origin_step=0,
                               llff_tile=False, dataset_type="synthetic",
                               loss_coh_lambda=lam)
        field = StyleFieldConfig(style_d=4, width=16, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 3)
        diag = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg,
                                     with_grad_ratio=True)
        return diag, state, data

    @pytest.mark.slow
    def test_ratio_linear_in_lambda_and_warn_regime(self):
        from tgtc.train.style3d import COH_RATIO_WARN, coherence_grad_ratio

        key = jax.random.PRNGKey(3)
        diag, state, data = self._setup(1.0)
        r1, g_coh, g_rgb = coherence_grad_ratio(diag, state, data, key)
        assert np.isfinite(r1) and r1 > 0 and g_coh > 0 and g_rgb > 0

        # the ratio is linear in lambda, so these land deterministically
        # on either side of the warning threshold
        hot = 20.0 * COH_RATIO_WARN / r1
        cold = 0.1 * COH_RATIO_WARN / r1
        diag_h, state_h, data_h = self._setup(hot)
        r_hot, _, _ = coherence_grad_ratio(diag_h, state_h, data_h, key)
        diag_c, state_c, data_c = self._setup(cold)
        r_cold, _, _ = coherence_grad_ratio(diag_c, state_c, data_c, key)
        assert r_hot > COH_RATIO_WARN, f"{r_hot} should warn"
        assert r_cold < COH_RATIO_WARN, f"{r_cold} should be silent"
        np.testing.assert_allclose(r_hot / r_cold, 200.0, rtol=1e-3)

    def test_diag_does_not_change_trajectory(self):
        """The probe must not donate or mutate the production state."""
        from tgtc.train.style3d import coherence_grad_ratio

        key = jax.random.PRNGKey(3)
        diag, state, data = self._setup(1.0)
        before = np.asarray(state.params["latents"]).copy()
        coherence_grad_ratio(diag, state, data, key)
        np.testing.assert_array_equal(
            np.asarray(state.params["latents"]), before)
