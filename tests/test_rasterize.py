"""Golden tests for the point-splat rasterizer on synthetic point clouds
(the pytorch3d-replacement semantics: behavioral, not bitwise —
SURVEY.md §7 'hard parts')."""

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.ops.rasterize import (
    cvv_to_pixel,
    llff_projection_matrix,
    ndc_to_world,
    rasterize_warp,
    splat_points,
    world_to_cvv,
)


def _identity_cam():
    return jnp.eye(4)[None]  # camera at origin looking down -z


class TestCameraMath:
    def test_center_point_projects_to_center(self):
        h, w, f = 40, 60, 50.0
        proj = jnp.asarray(llff_projection_matrix(h, w, f))
        pt = jnp.array([[0.0, 0.0, -2.0]])
        cvv, w_clip = world_to_cvv(pt, jnp.eye(4), proj)
        assert float(w_clip[0]) > 0
        px, py = cvv_to_pixel(cvv, h, w)
        # principal point = (w/2, h/2): x_cvv = 1-2*cx/w ≈ -0 → pixel center
        np.testing.assert_allclose(float(px[0]), (w - 1) / 2, atol=1.0)
        np.testing.assert_allclose(float(py[0]), (h - 1) / 2, atol=1.0)

    def test_behind_camera_flagged(self):
        proj = jnp.asarray(llff_projection_matrix(10, 10, 10.0))
        pt = jnp.array([[0.0, 0.0, 5.0]])  # +z = behind
        _, w_clip = world_to_cvv(pt, jnp.eye(4), proj)
        assert float(w_clip[0]) < 0

    def test_depth_ordering_monotonic(self):
        proj = jnp.asarray(llff_projection_matrix(10, 10, 10.0))
        pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -2.0], [0.0, 0.0, -5.0]])
        cvv, _ = world_to_cvv(pts, jnp.eye(4), proj)
        z = np.asarray(cvv[:, 2])
        assert z[0] < z[1] < z[2]  # closer → smaller NDC depth

    def test_ndc_world_roundtrip_shape(self):
        coor_ndc = jnp.array([[[0.1, -0.2, 0.3]]])
        out = ndc_to_world(coor_ndc, 40, 60, 50.0)
        assert out.shape == (1, 1, 3)
        # z = 2/(ndc_z - 1)
        np.testing.assert_allclose(float(out[0, 0, 2]), 2.0 / (0.3 - 1.0),
                                   rtol=1e-6)


class TestSplat:
    def test_single_point_lands_at_projection(self):
        h, w, f = 21, 21, 20.0
        proj = jnp.asarray(llff_projection_matrix(h, w, f))
        pt = jnp.array([[0.0, 0.0, -2.0]])
        rgb = jnp.array([[1.0, 0.5, 0.25]])
        rgb_map, coor_map, mask = rasterize_warp(
            pt, rgb, _identity_cam(), proj, h, w
        )
        m = np.asarray(mask[0, ..., 0])
        assert m.sum() >= 1  # covers at least the center pixel
        ys, xs = np.nonzero(m)
        assert np.all(np.abs(ys - (h - 1) / 2) <= 2)
        assert np.all(np.abs(xs - (w - 1) / 2) <= 2)
        hit = np.asarray(rgb_map[0][ys[0], xs[0]])
        np.testing.assert_allclose(hit, [1.0, 0.5, 0.25], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(coor_map[0][ys[0], xs[0]]), [0, 0, -2.0], atol=1e-5
        )

    def test_occlusion_nearest_wins(self):
        h = w = 21
        proj = jnp.asarray(llff_projection_matrix(h, w, 20.0))
        pts = jnp.array([[0.0, 0.0, -3.0], [0.0, 0.0, -1.5]])  # second closer
        rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        rgb_map, _, mask = rasterize_warp(pts, rgb, _identity_cam(), proj, h, w)
        c = np.asarray(rgb_map[0, (h - 1) // 2, (w - 1) // 2])
        np.testing.assert_allclose(c, [0.0, 1.0, 0.0], atol=1e-6)

    def test_empty_pixels_masked(self):
        h = w = 15
        proj = jnp.asarray(llff_projection_matrix(h, w, 14.0))
        pt = jnp.array([[0.0, 0.0, -2.0]])
        rgb = jnp.ones((1, 3))
        rgb_map, _, mask = rasterize_warp(pt, rgb, _identity_cam(), proj, h, w)
        m = np.asarray(mask[0, ..., 0])
        assert m.sum() < 10  # almost all pixels empty
        empty = np.asarray(rgb_map[0])[m == 0]
        np.testing.assert_allclose(empty, 0.0)

    def test_batch_views(self):
        h = w = 11
        proj = jnp.asarray(llff_projection_matrix(h, w, 10.0))
        cams = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.5)])
        pts = jnp.array([[0.0, 0.0, -2.0]])
        rgb = jnp.ones((1, 3))
        rgb_map, _, mask = rasterize_warp(pts, rgb, cams, proj, h, w)
        assert rgb_map.shape == (2, h, w, 3)
        m0, m1 = np.asarray(mask[0, ..., 0]), np.asarray(mask[1, ..., 0])
        y0, x0 = np.argwhere(m0)[0]
        y1, x1 = np.argwhere(m1)[0]
        assert x1 != x0  # translated camera sees the point elsewhere

    def test_feature_gradients_flow(self):
        """Temporal loss needs d(warped)/d(features)."""
        h = w = 11
        proj = jnp.asarray(llff_projection_matrix(h, w, 10.0))
        pts = jnp.array([[0.0, 0.0, -2.0], [0.2, 0.1, -2.5]])

        def loss(rgb):
            rgb_map, _, mask = rasterize_warp(pts, rgb, _identity_cam(), proj, h, w)
            return jnp.sum(rgb_map ** 2)

        g = jax.grad(loss)(jnp.ones((2, 3)) * 0.5)
        assert np.any(np.asarray(g) != 0)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_warp_roundtrip_consistency(self):
        """A dense tilted-plane cloud warped into its OWN view: warped colors
        must stay close to the source image (winner may be a sub-pixel
        neighbor — faithful top-1 z-buffer semantics, same as the
        reference's pytorch3d z=1 raster) and the warped coor map must pass
        the reference's 5e-2 occlusion test
        (/root/reference/train_style_modules.py:479-480)."""
        h, w, f = 24, 32, 30.0
        proj = jnp.asarray(llff_projection_matrix(h, w, f))
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x_cam = (xs - (w - 1) / 2)
        y_cam = -(ys - (h - 1) / 2)
        z = -2.0 - 0.003 * x_cam - 0.002 * y_cam
        pts_cam = np.stack(
            [x_cam / f * -z, y_cam / f * -z, z], axis=-1
        ).reshape(-1, 3).astype(np.float32)
        # smooth image: color = f(pixel position)
        rgb = np.stack(
            [xs / w, ys / h, 0.5 * np.ones_like(xs)], axis=-1
        ).reshape(-1, 3).astype(np.float32)
        rgb_map, coor_map, mask = rasterize_warp(
            jnp.asarray(pts_cam), jnp.asarray(rgb),
            _identity_cam(), proj, h, w,
        )
        m = np.asarray(mask[0, ..., 0]).reshape(-1) > 0
        assert m.mean() > 0.95  # dense cloud covers nearly every pixel
        got_rgb = np.asarray(rgb_map[0]).reshape(-1, 3)
        close = np.all(np.abs(got_rgb[m] - rgb[m]) < 0.08, axis=-1)
        assert close.mean() > 0.9, f"only {close.mean():.2%} colors close"
        got_coor = np.asarray(coor_map[0]).reshape(-1, 3)
        dist2 = np.sum((got_coor[m] - pts_cam[m]) ** 2, axis=-1)
        # winner may be a ~1-pixel neighbor; pixel world-spacing = |z|/f
        px_spacing = 2.0 / f
        assert np.mean(dist2 < (2 * px_spacing) ** 2) > 0.95
