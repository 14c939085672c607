"""Early ray termination via per-ray sample budgets (ops.sampling.
select_sample_budget + render.fast fine_budget).

The reference composites every merged sample unconditionally
(/root/reference/utils.py:354-386); the TPU-native speed lever is culling
low-contribution samples into a smaller dense fine-MLP problem. These tests
pin (a) the exact semantics — budget compositing equals the full composite
with the dropped samples' alphas forced to zero — and (b) the quality claim
on a trained scene: a 28/32 budget render matches the full render to high
PSNR and costs <0.1 dB against ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.ops.composite import alpha_composite, sigma_weights
from tgtc.ops.sampling import (
    sample_along_rays_uniform,
    sample_pdf,
    select_sample_budget,
)


def _toy_merged(r=16, nc=8, nf=8, seed=0):
    """Coarse ts + a concentrated synthetic density -> merged fine ts."""
    rng = np.random.default_rng(seed)
    ts = np.linspace(0.1, 1.0, nc, dtype=np.float32)[None].repeat(r, 0)
    # density wall at a per-ray depth: weights concentrate in 1-2 bins
    wall = rng.uniform(0.3, 0.8, (r, 1)).astype(np.float32)
    sigma_c = 80.0 * np.exp(-((ts - wall) / 0.05) ** 2).astype(np.float32)
    weights_c = np.asarray(sigma_weights(jnp.asarray(sigma_c),
                                         jnp.asarray(ts)))
    ts_mid = 0.5 * (ts[:, 1:] + ts[:, :-1])
    t_new = np.asarray(sample_pdf(jnp.asarray(ts_mid),
                                  jnp.asarray(weights_c[:, 1:-1]), nf))
    ts_all = np.sort(np.concatenate([ts, t_new], axis=-1), axis=-1)
    return (jnp.asarray(ts_all), jnp.asarray(ts), jnp.asarray(sigma_c),
            wall)


class TestSelectSampleBudget:
    def test_full_budget_is_identity(self):
        ts_all, ts, sig, _ = _toy_merged()
        kept_t, kept_d = select_sample_budget(ts_all, ts, sig, ts_all.shape[-1])
        np.testing.assert_array_equal(np.asarray(kept_t), np.asarray(ts_all))
        want_d = np.diff(np.asarray(ts_all), axis=-1)
        np.testing.assert_allclose(np.asarray(kept_d)[:, :-1], want_d,
                                   rtol=1e-6)
        assert np.all(np.asarray(kept_d)[:, -1] >= 1e9)

    def test_keeps_high_weight_region(self):
        """With density concentrated at a wall, every kept sample must lie
        near it (empty/occluded space is what gets dropped)."""
        ts_all, ts, sig, wall = _toy_merged()
        kept_t, _ = select_sample_budget(ts_all, ts, sig, 8)
        kept_t = np.asarray(kept_t)
        assert np.all(np.diff(kept_t, axis=-1) >= 0)  # depth order
        # all kept samples within the wall's +-2-bin neighbourhood
        assert np.all(np.abs(kept_t - wall) < 0.3)

    def test_budget_validation(self):
        ts_all, ts, sig, _ = _toy_merged()
        with pytest.raises(ValueError):
            select_sample_budget(ts_all, ts, sig, 0)
        with pytest.raises(ValueError):
            select_sample_budget(ts_all, ts, sig, ts_all.shape[-1] + 1)

    @pytest.mark.parametrize("near,far,nc,nf,k", [
        (0.1, 1.0, 8, 8, 8),        # toy fixture geometry
        (0.0, 1.0, 64, 128, 80),    # production fused-render geometry
    ])
    def test_grid_fast_path_bitwise_equal(self, near, far, nc, nf, k):
        """grid=(near, far) (direct floor bin index, the plain-NeRF fused
        render's path) must be BITWISE equal to the comparison-count on an
        unperturbed uniform grid — same guarantee the TPU lab measured
        (perf/ert_select_lab.py: equal at 3.46 vs 3.84 ms/16k-ray block)."""
        rng = np.random.default_rng(11)
        r = 64
        ro = jnp.asarray(rng.uniform(-0.5, 0.5, (r, 3)).astype(np.float32))
        rd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        _, ts = sample_along_rays_uniform(ro, rd, nc, near=near, far=far)
        sig = jnp.asarray(
            rng.uniform(0.0, 30.0, (r, nc)).astype(np.float32))
        w = sigma_weights(sig, ts)
        ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
        t_new = sample_pdf(ts_mid, w[..., 1:-1], nf)
        ts_all = jnp.sort(jnp.concatenate([ts, t_new], -1), -1)

        want_t, want_d = select_sample_budget(ts_all, ts, sig, k)
        got_t, got_d = select_sample_budget(ts_all, ts, sig, k,
                                            grid=(near, far))
        np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


class TestBudgetCompositeSemantics:
    def test_equals_masked_full_composite(self):
        """Budget compositing (subset + original deltas) must equal the
        full composite with dropped alphas forced to zero — for ANY fields,
        not just concentrated ones."""
        rng = np.random.default_rng(3)
        ts_all, ts, sig, _ = _toy_merged(r=32, seed=3)
        r, m = ts_all.shape
        k = 10
        sigma = jnp.asarray(
            rng.uniform(0.0, 30.0, (r, m)).astype(np.float32))
        rgb = jnp.asarray(rng.uniform(0, 1, (r, m, 3)).astype(np.float32))

        kept_t, kept_d = select_sample_budget(ts_all, ts, sig, k)
        # map kept depths back to their full-set indices
        idx = np.argmin(
            np.abs(np.asarray(ts_all)[:, None, :]
                   - np.asarray(kept_t)[:, :, None]), axis=-1)
        sig_k = jnp.take_along_axis(sigma, jnp.asarray(idx), axis=-1)
        rgb_k = jnp.take_along_axis(rgb, jnp.asarray(idx)[..., None], axis=-2)

        got = alpha_composite(rgb_k, sig_k, kept_t, deltas=kept_d)

        # reference: full composite, dropped alphas := 0
        deltas = np.diff(np.asarray(ts_all), axis=-1)
        deltas = np.concatenate([deltas, np.full((r, 1), 1e10, np.float32)],
                                axis=-1)
        alpha = 1.0 - np.exp(-np.maximum(np.asarray(sigma), 0.0) * deltas)
        keep_mask = np.zeros((r, m), bool)
        np.put_along_axis(keep_mask, idx, True, axis=-1)
        alpha = np.where(keep_mask, alpha, 0.0)
        trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = np.concatenate([np.ones((r, 1), np.float32),
                                trans[:, :-1]], axis=-1)
        wts = alpha * trans
        want_rgb = (wts[..., None] * np.asarray(rgb)).sum(-2)
        want_t = (wts * np.asarray(ts_all)).sum(-1)

        np.testing.assert_allclose(np.asarray(got.rgb), want_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.t_exp), want_t, atol=1e-5)


class TestBudgetRender:
    def _renderer(self, state, budget, ns=8, nsf=8):
        from tgtc.render.fast import FusedNerfRenderer
        from tgtc.render.volume import RenderSettings

        settings = RenderSettings(n_samples=ns, n_samples_fine=nsf,
                                  sigma_noise_std=0.0)
        return FusedNerfRenderer.from_params(
            state.params_coarse, state.params_fine, settings,
            depth=2, num_freq_coor=4, num_freq_dir=2, width=32,
            tile=128, interpret=True, fine_budget=budget,
        )

    def test_full_budget_identical_to_exact_path(self):
        from tests.test_train_nerf import TINY_NERF, TINY_TRAIN
        from tgtc.train.nerf_trainer import init_state

        _, _, state = init_state(jax.random.PRNGKey(0), TINY_NERF,
                                 TINY_TRAIN)
        key = jax.random.PRNGKey(1)
        ro = jax.random.uniform(key, (128, 3), minval=-0.5, maxval=0.5)
        rd = jax.random.normal(key, (128, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        out_full = self._renderer(state, None).render(ro, rd)
        out_b16 = self._renderer(state, 16).render(ro, rd)  # == nc+nf
        np.testing.assert_array_equal(np.asarray(out_full["rgb"]),
                                      np.asarray(out_b16["rgb"]))

    @pytest.mark.slow
    def test_trained_scene_budget_quality(self, synthetic_llff_dir):
        """Train a tiny NeRF on the synthetic scene, then compare a
        28/32-budget fused render against the full fused render and GT:
        agreement PSNR high, GT-PSNR delta < 0.1 dB (VERDICT r3 item 3).

        NB the 300-step tiny model is deliberately diffuse (even an ORACLE
        top-20/32 by true fine weights drops 11% of the weight mass here),
        so this asserts the conservative 28/32 point; the production-ratio
        quality claim (64-80/128, <0.1 dB) is validated on the realscale
        TPU scene (perf/validate_realscale.py --fine_budget)."""
        from tests.test_train_nerf import TINY_NERF, TINY_TRAIN
        from tgtc.data import load_llff_data, rays_for_poses
        from tgtc.train.nerf_trainer import init_state, make_train_step

        scene = load_llff_data(synthetic_llff_dir, factor=1)
        h, w = scene.images.shape[1:3]
        ro, rd = rays_for_poses(h, w, jnp.asarray(scene.intrinsics),
                                jnp.asarray(scene.poses), use_ndc=True)
        ro = jnp.reshape(ro, (-1, 3))
        rd = jnp.reshape(rd, (-1, 3))
        rgb_gt = jnp.reshape(jnp.asarray(scene.images), (-1, 3))

        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF,
                                   TINY_TRAIN)
        step = make_train_step(cm, fm, TINY_TRAIN)
        key = jax.random.PRNGKey(2)
        n = ro.shape[0]
        for i in range(300):
            key, k1, k2 = jax.random.split(key, 3)
            sel = jax.random.randint(k1, (TINY_TRAIN.batch_size,), 0, n)
            state, m = step(state, ro[sel], rd[sel], rgb_gt[sel], k2)
        assert float(m["psnr_fine"]) > 25.0, "overfit failed; test invalid"

        view = slice(0, h * w)  # first view: 32*40=1280 rays, one block
        out_full = self._renderer(state, None, 16, 16).render(
            ro[view], rd[view])
        out_b = self._renderer(state, 28, 16, 16).render(
            ro[view], rd[view])

        gt = np.asarray(rgb_gt[view])
        full = np.clip(np.asarray(out_full["rgb"]), 0, 1)
        bud = np.clip(np.asarray(out_b["rgb"]), 0, 1)

        def psnr(a, b):
            return -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)

        agree = psnr(full, bud)
        d_gt = psnr(gt, full) - psnr(gt, bud)
        assert agree > 35.0, f"budget render diverges: agree={agree:.1f} dB"
        assert abs(d_gt) < 0.1, f"GT PSNR delta {d_gt:.3f} dB"
