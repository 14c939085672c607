"""SIREN-mode NeRF (act_type='sine'): raw coordinates, sine activations,
sigma amplification (/root/reference/models.py:186-200)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig, make_nerf, nerf_apply


class TestSiren:
    def test_forward_shapes_and_sigma_mul(self):
        cfg = NerfConfig(depth=2, width=16, act_type="sine",
                         siren_sigma_mul=20.0, skips=(),
                         compute_dtype=jnp.float32)
        assert cfg.is_siren and cfg.input_ch == 3 and cfg.input_ch_viewdir == 3
        model, params = make_nerf(cfg, jax.random.PRNGKey(0))
        pts = jax.random.uniform(jax.random.PRNGKey(1), (10, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
        out = nerf_apply(model, params, pts, dirs)
        assert out["rgb"].shape == (10, 3)
        assert out["sigma"].shape == (10,)
        # pts pass through unembedded in siren mode
        np.testing.assert_array_equal(np.asarray(out["pts_embed"]),
                                      np.asarray(pts))

    def test_sigma_amplification_applied(self):
        """sigma = raw + relu(raw)*mul → positive raw sigmas scale by 21x."""
        cfg_amp = NerfConfig(depth=2, width=16, act_type="sine",
                             siren_sigma_mul=20.0, skips=(),
                             compute_dtype=jnp.float32)
        cfg_flat = NerfConfig(depth=2, width=16, act_type="sine",
                              siren_sigma_mul=0.0, skips=(),
                              compute_dtype=jnp.float32)
        model_a, params = make_nerf(cfg_amp, jax.random.PRNGKey(0))
        model_f = type(model_a)(cfg_flat)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3)) * 2
        dirs = jnp.ones((64, 3))
        sig_a = np.asarray(nerf_apply(model_a, params, pts, dirs)["sigma"])
        sig_f = np.asarray(nerf_apply(model_f, params, pts, dirs)["sigma"])
        pos = sig_f > 0
        assert pos.any()
        np.testing.assert_allclose(sig_a[pos], sig_f[pos] * 21.0, rtol=1e-5)
        np.testing.assert_allclose(sig_a[~pos], sig_f[~pos], rtol=1e-5)
