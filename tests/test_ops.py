"""Unit tests for the volume-rendering math core (tgtc.ops).

Brute-force numpy references implement the same closed-form math as the
PyTorch reference (/root/reference/utils.py:354-609) so these tests pin
numerics for every layer above.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.ops import (
    alpha_composite,
    encoding_dim,
    img2mse,
    merge_and_resample_fine,
    mse2psnr,
    positional_encoding,
    sample_along_rays_uniform,
    sample_pdf,
    cosine_similarity,
)


class TestEncoding:
    def test_dims(self):
        x = jnp.ones((5, 3))
        for L in [4, 10]:
            out = positional_encoding(x, L)
            assert out.shape == (5, encoding_dim(3, L))
            assert encoding_dim(3, L) == 3 + 3 * 2 * L

    def test_values_and_order(self):
        """Feature order must match the reference Embedder:
        [x, sin(x*1), cos(x*1), sin(x*2), cos(x*2), ...]."""
        x = np.array([[0.3, -0.7, 1.2]], np.float32)
        out = np.asarray(positional_encoding(jnp.asarray(x), 3))
        expect = [x[0]]
        for f in [1.0, 2.0, 4.0]:
            expect.append(np.sin(x[0] * f))
            expect.append(np.cos(x[0] * f))
        np.testing.assert_allclose(out[0], np.concatenate(expect), rtol=1e-6)

    def test_jit_grad(self):
        f = jax.jit(lambda x: jnp.sum(positional_encoding(x, 10) ** 2))
        g = jax.grad(f)(jnp.ones((4, 3)))
        assert g.shape == (4, 3)
        assert np.all(np.isfinite(np.asarray(g)))


class TestUniformSampling:
    def test_deterministic_spacing(self):
        o = jnp.zeros((7, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (7, 1))
        pts, ts = sample_along_rays_uniform(o, d, 16, near=0.5, far=2.5)
        assert pts.shape == (7, 16, 3)
        np.testing.assert_allclose(np.asarray(ts[0]), np.linspace(0.5, 2.5, 16), rtol=1e-6)
        # pts = o + t*d
        np.testing.assert_allclose(np.asarray(pts[:, :, 2]), np.asarray(ts), rtol=1e-6)

    def test_perturb_within_bins(self):
        o, d = jnp.zeros((64, 3)), jnp.ones((64, 3))
        _, ts_det = sample_along_rays_uniform(o, d, 32, near=0.0, far=1.0)
        _, ts = sample_along_rays_uniform(
            o, d, 32, near=0.0, far=1.0, key=jax.random.PRNGKey(0)
        )
        ts_det, ts = np.asarray(ts_det), np.asarray(ts)
        mid = 0.5 * (ts_det[:, 1:] + ts_det[:, :-1])
        lower = np.concatenate([ts_det[:, :1], mid], axis=1)
        upper = np.concatenate([mid, ts_det[:, -1:]], axis=1)
        assert np.all(ts >= lower - 1e-6) and np.all(ts <= upper + 1e-6)
        assert not np.allclose(ts, ts_det)

    def test_harmony_disparity_spacing(self):
        o, d = jnp.zeros((2, 3)), jnp.ones((2, 3))
        _, ts = sample_along_rays_uniform(o, d, 8, near=1.0, far=4.0, harmony=True)
        ts = np.asarray(ts[0])
        # uniform in disparity: 1/t linear between 1/near and 1/far
        np.testing.assert_allclose(1.0 / ts, np.linspace(1.0, 0.25, 8), rtol=1e-5)


class TestSamplePdf:
    def test_inverse_cdf_statistics(self):
        """Samples from a peaked pdf should concentrate near the peak."""
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
        w = np.full((4, 10), 1e-4, np.float32)
        w[:, 7] = 1.0  # peak in bin [0.7, 0.8]
        s = np.asarray(sample_pdf(bins, jnp.asarray(w), 128, key=jax.random.PRNGKey(1)))
        frac_in_peak = np.mean((s >= 0.7) & (s <= 0.8))
        assert frac_in_peak > 0.95

    def test_deterministic_matches_quantiles(self):
        """det mode: evenly spaced u inverse-mapped through the CDF."""
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
        w = jnp.ones((1, 4))
        s = np.asarray(sample_pdf(bins, w, 9))
        np.testing.assert_allclose(s[0], np.linspace(0.0, 1.0, 9), atol=1e-5)

    def test_merge_and_resample_sorted(self):
        key = jax.random.PRNGKey(2)
        o = jnp.zeros((8, 3))
        d = jnp.ones((8, 3))
        _, ts = sample_along_rays_uniform(o, d, 16)
        w = jax.random.uniform(key, (8, 16))
        pts, t_all = merge_and_resample_fine(o, d, ts, w, 16)
        assert t_all.shape == (8, 32)
        assert pts.shape == (8, 32, 3)
        t_np = np.asarray(t_all)
        assert np.all(np.diff(t_np, axis=-1) >= 0)

    def test_merge_two_sorted_equals_sort(self):
        from tgtc.ops.sampling import merge_two_sorted

        rng = np.random.default_rng(5)
        a = np.sort(rng.uniform(size=(16, 9)).astype(np.float32), axis=-1)
        b = np.sort(rng.uniform(size=(16, 13)).astype(np.float32), axis=-1)
        got = np.asarray(merge_two_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_allclose(got, want)
        # with exact ties
        a2 = jnp.asarray([[0.0, 0.5, 0.5, 1.0]])
        b2 = jnp.asarray([[0.5, 0.5, 2.0]])
        got2 = np.asarray(merge_two_sorted(a2, b2))
        np.testing.assert_allclose(got2, [[0.0, 0.5, 0.5, 0.5, 0.5, 1.0, 2.0]])

    def test_no_gradient_through_sampling(self):
        o, d = jnp.zeros((4, 3)), jnp.ones((4, 3))
        _, ts = sample_along_rays_uniform(o, d, 8)

        def loss(w):
            _, t_all = merge_and_resample_fine(o, d, ts, w, 8)
            return jnp.sum(t_all)

        g = jax.grad(loss)(jnp.ones((4, 8)))
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestAlphaComposite:
    def _brute_force(self, rgb, sigma, t):
        """Direct transcription of NeRF quadrature."""
        r, n, _ = rgb.shape
        delta = np.concatenate([t[:, 1:] - t[:, :-1], np.full((r, 1), 1e10)], axis=1)
        alpha = 1.0 - np.exp(-np.maximum(sigma, 0.0) * delta)
        out_rgb = np.zeros((r, 3))
        out_t = np.zeros(r)
        weights = np.zeros((r, n))
        for i in range(r):
            trans = 1.0
            for j in range(n):
                w = alpha[i, j] * trans
                weights[i, j] = w
                out_rgb[i] += w * rgb[i, j]
                out_t[i] += w * t[i, j]
                trans *= 1.0 - alpha[i, j] + 1e-10
        return out_rgb, out_t, weights

    def test_matches_brute_force(self, rng):
        rgb = rng.uniform(size=(16, 12, 3)).astype(np.float32)
        sigma = rng.normal(size=(16, 12)).astype(np.float32) * 2
        t = np.sort(rng.uniform(0.1, 3.0, size=(16, 12)).astype(np.float32), axis=1)
        out = alpha_composite(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t))
        ref_rgb, ref_t, ref_w = self._brute_force(rgb, sigma, t)
        np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.t_exp), ref_t, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), ref_w, rtol=1e-4, atol=1e-5)

    def test_opaque_first_sample_wins(self):
        rgb = jnp.tile(jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]), (3, 1, 1))
        sigma = jnp.array([[1e8, 1e8]] * 3)
        t = jnp.tile(jnp.array([[0.5, 1.0]]), (3, 1))
        out = alpha_composite(rgb, sigma, t)
        np.testing.assert_allclose(np.asarray(out.rgb), [[1, 0, 0]] * 3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.t_exp), [0.5] * 3, atol=1e-5)

    def test_white_background(self):
        rgb = jnp.zeros((2, 4, 3))
        sigma = jnp.full((2, 4), -10.0)  # fully transparent
        t = jnp.broadcast_to(jnp.linspace(0, 1, 4), (2, 4))
        out = alpha_composite(rgb, sigma, t, white_bkgd=True)
        np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)

    def test_noise_reproducible(self):
        k = jax.random.PRNGKey(3)
        rgb = jnp.ones((4, 8, 3)) * 0.5
        sigma = jnp.zeros((4, 8))
        t = jnp.broadcast_to(jnp.linspace(0.1, 1.0, 8), (4, 8))
        a = alpha_composite(rgb, sigma, t, noise_std=1.0, key=k)
        b = alpha_composite(rgb, sigma, t, noise_std=1.0, key=k)
        np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
        c = alpha_composite(rgb, sigma, t)
        assert not np.allclose(np.asarray(a.rgb), np.asarray(c.rgb))


class TestLosses:
    def test_psnr(self):
        mse = jnp.asarray(0.01)
        np.testing.assert_allclose(float(mse2psnr(mse)), 20.0, rtol=1e-5)

    def test_mse(self):
        np.testing.assert_allclose(
            float(img2mse(jnp.ones((4,)), jnp.zeros((4,)))), 1.0
        )

    def test_cosine_similarity(self):
        a = jnp.array([[1.0, 0.0], [1.0, 1.0]])
        b = jnp.array([[0.0, 1.0], [1.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(cosine_similarity(a, b)), [0.0, 1.0], atol=1e-6
        )
