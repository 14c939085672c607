"""Tests for ray generation, NDC projection, and the LLFF loader."""

import numpy as np
import jax.numpy as jnp

from tgtc.data import generate_rays, ndc_rays, rays_for_poses, load_llff_data


class TestRays:
    def test_center_pixel_points_forward(self):
        h, w, f = 10, 10, 20.0
        K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        c2w = jnp.eye(4)[:3, :4]
        rays_o, rays_d = generate_rays(h, w, K, c2w, pixel_alignment=False)
        assert rays_o.shape == (h, w, 3)
        # camera at origin
        np.testing.assert_allclose(np.asarray(rays_o), 0.0)
        # pixel (cy, cx) direction is exactly -z
        d = np.asarray(rays_d[h // 2, w // 2])
        np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)

    def test_rotation_applied(self):
        h, w, f = 4, 4, 8.0
        K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        # camera rotated 180 deg about y: looks along +z
        c2w = jnp.array(
            [[-1.0, 0, 0, 1.0], [0, 1.0, 0, 2.0], [0, 0, -1.0, 3.0]]
        )
        rays_o, rays_d = generate_rays(h, w, K, c2w)
        np.testing.assert_allclose(np.asarray(rays_o[0, 0]), [1, 2, 3])
        d = np.asarray(rays_d[h // 2, w // 2])
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)

    def test_batched_poses(self):
        h, w, f = 6, 8, 10.0
        K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        poses = jnp.stack([jnp.eye(4)[:3, :4]] * 5)
        rays_o, rays_d = generate_rays(h, w, K, poses)
        assert rays_o.shape == (5, h, w, 3)
        assert rays_d.shape == (5, h, w, 3)

    def test_ndc_points_inside_cube(self):
        """NDC x,y of rays through the image must land in [-1, 1] at the near
        plane, and origins sit on the z=near plane (o2 = 1 + 2*near/oz with
        oz = -near → -1)."""
        h, w, f = 20, 30, 25.0
        K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
        c2w = jnp.eye(4)[:3, :4]
        rays_o, rays_d = generate_rays(h, w, K, c2w, pixel_alignment=True)
        no, nd = ndc_rays(h, w, f, 1.0, rays_o, rays_d)
        no, nd = np.asarray(no), np.asarray(nd)
        assert np.all(np.abs(no[..., 0]) <= 1.0 + 1e-5)
        assert np.all(np.abs(no[..., 1]) <= 1.0 + 1e-5)
        np.testing.assert_allclose(no[..., 2], -1.0, atol=1e-5)
        # at t=1 the NDC point reaches the far plane z=1
        np.testing.assert_allclose((no + nd)[..., 2], 1.0, atol=1e-5)

    def test_rays_for_poses_shapes(self):
        h, w, f = 5, 7, 9.0
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32)[None, :3, :4], (3, 1, 1))
        ro, rd = rays_for_poses(h, w, jnp.asarray(K), jnp.asarray(poses), use_ndc=True)
        assert ro.shape == (3, h, w, 3) and rd.shape == (3, h, w, 3)


class TestLlffLoader:
    def test_load_synthetic_scene(self, synthetic_llff_dir):
        scene = load_llff_data(synthetic_llff_dir, factor=1, bd_factor=0.75)
        assert scene.images.shape == (8, 32, 40, 3)
        assert scene.images.dtype == np.float32
        assert 0.0 <= scene.images.min() and scene.images.max() <= 1.0
        assert scene.poses.shape == (8, 3, 5)
        assert scene.render_poses.shape[0] == 120
        assert 0 <= scene.i_test < 8
        h, w, f = scene.hwf
        assert (h, w) == (32, 40)

    def test_recentered_average_is_identity(self, synthetic_llff_dir):
        from tgtc.data.llff import average_pose

        scene = load_llff_data(synthetic_llff_dir, factor=1)
        avg = average_pose(scene.poses)
        np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)

    def test_bounds_rescaled(self, synthetic_llff_dir):
        scene = load_llff_data(synthetic_llff_dir, factor=1, bd_factor=0.75)
        # bds.min() * bd_factor scaling → min bound becomes 1/0.75
        np.testing.assert_allclose(scene.bds.min(), 1.0 / 0.75, rtol=1e-5)

    def test_minify(self, synthetic_llff_dir):
        scene = load_llff_data(synthetic_llff_dir, factor=2)
        assert scene.images.shape == (8, 16, 20, 3)
        h, w, f = scene.hwf
        assert (h, w) == (16, 20)
        np.testing.assert_allclose(f, 25.0, rtol=1e-5)  # 50/2
