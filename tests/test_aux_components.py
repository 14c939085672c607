"""Tests for auxiliary capability-surface components: AdaIN net, NeRF-W
compositing, pose interpolation, pyramid splat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.adain_net import make_adain_net
from tgtc.ops.composite import alpha_composite, alpha_composite_wild
from tgtc.data.poses import interpolate_poses, min_line_dist_center, normalize_cps


class TestAdainNet:
    @pytest.mark.slow
    def test_losses_and_stylize(self):
        model, params = make_adain_net(jax.random.PRNGKey(0), image_size=32)
        c = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        s = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        out = model.apply(params, c, s, method=model.compute_losses)
        assert np.isfinite(float(out["loss_c"]))
        assert np.isfinite(float(out["loss_s"]))
        assert out["stylized"].shape == c.shape
        img = model.apply(params, c, s, 0.5, method=model.stylize)
        assert img.shape == c.shape


class TestWildComposite:
    def test_zero_transient_matches_static(self):
        """With transient density → -inf (relu→0), wild compositing reduces
        to the plain compositor."""
        key = jax.random.PRNGKey(0)
        rgb = jax.random.uniform(key, (4, 8, 3))
        sigma = jax.random.normal(key, (4, 8))
        t = jnp.broadcast_to(jnp.linspace(0.1, 1.0, 8), (4, 8))
        tr_rgb = jnp.zeros((4, 8, 3))
        tr_sigma = jnp.full((4, 8), -100.0)
        tr_beta = jnp.zeros((4, 8, 1))
        rgb_exp, t_exp, w, beta = alpha_composite_wild(
            rgb, sigma, t, tr_rgb, tr_sigma, tr_beta
        )
        ref = alpha_composite(rgb, sigma, t)
        np.testing.assert_allclose(np.asarray(rgb_exp), np.asarray(ref.rgb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(beta), 0.03, atol=1e-6)


class TestPoses:
    def test_interpolation_endpoints_and_count(self):
        cps = np.tile(np.eye(4, dtype=np.float32)[None], (3, 1, 1))
        cps[1, :3, 3] = [1, 0, 0]
        cps[2, :3, 3] = [2, 0, 0]
        out = interpolate_poses(cps, 0.5)  # 2 steps per gap
        assert out.shape == (5, 4, 4)
        np.testing.assert_allclose(out[0], cps[0], atol=1e-6)
        np.testing.assert_allclose(out[-1], cps[2], atol=1e-6)
        np.testing.assert_allclose(out[1][:3, 3], [0.5, 0, 0], atol=1e-6)

    def test_slerp_rotation_midpoint(self):
        from tgtc.data.poses import _slerp

        r0 = np.eye(3)
        th = np.pi / 2
        r1 = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        mid = _slerp(r0, r1, 0.5)
        th2 = np.pi / 4
        expect = np.array([[np.cos(th2), -np.sin(th2), 0],
                           [np.sin(th2), np.cos(th2), 0], [0, 0, 1]])
        np.testing.assert_allclose(mid, expect, atol=1e-6)

    def test_min_line_dist_center_converging(self):
        """Cameras on a circle looking at the origin → center ≈ origin."""
        n = 8
        rays_o, rays_d = [], []
        for i in range(n):
            th = 2 * np.pi * i / n
            o = np.array([3 * np.cos(th), 3 * np.sin(th), 0.5])
            rays_o.append(o)
            rays_d.append(-o / np.linalg.norm(o))
        c = min_line_dist_center(np.stack(rays_o), np.stack(rays_d))
        np.testing.assert_allclose(c, 0.0, atol=1e-6)

    def test_normalize_cps_unit_radius(self):
        cps = np.tile(np.eye(4, dtype=np.float32)[None], (4, 1, 1))
        for i, t in enumerate([[2, 0, 5], [0, 3, 5], [-4, 0, 5], [0, -1, 5]]):
            cps[i, :3, 3] = t
            cps[i, :3, 2] = [0, 0, -1]
        out = normalize_cps(cps, scale=1.0)
        r = np.linalg.norm(out[:, :3, 3], axis=-1)
        np.testing.assert_allclose(r.max(), 1.0, rtol=1e-5)


class TestPyramidSplat:
    def test_runs_and_masks(self):
        from tgtc.ops.rasterize import llff_projection_matrix, rasterize_pyramid

        h = w = 15
        proj = jnp.asarray(llff_projection_matrix(h, w, 14.0))
        pts = jnp.array([[0.0, 0.0, -2.0]])
        rgb = jnp.ones((1, 3))
        img, mask = rasterize_pyramid(pts, rgb, jnp.eye(4)[None], proj, h, w)
        assert img.shape == (1, h, w, 3)
        assert mask.shape == (1, h, w, 1)
