"""The 360°/spherify and no-NDC paths (reference ``--spherify``/``--no_ndc``
flags, /root/reference/config.py:17,20; load_llff.py:175-231)."""

import numpy as np
import pytest

import jax

from tgtc.config import Config
from tgtc.data.llff import load_llff_data, spherify_poses
from tgtc.train.pipeline import Pipeline


@pytest.fixture(scope="module")
def ring_scene_dir(tmp_path_factory):
    """An inward-looking 360° camera ring written in LLFF format."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ring_scene")
    (root / "images").mkdir()
    n, h, w, focal = 10, 24, 32, 40.0
    rng = np.random.default_rng(5)
    poses = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        pos = np.array([3 * np.cos(ang), 3 * np.sin(ang), 0.3])
        fwd = -pos / np.linalg.norm(pos)          # look at origin (-z cam)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, -fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(-fwd, right)
        c2w = np.stack([right, true_up, -fwd, pos], axis=1)  # [3,4]
        hwf = np.array([[h], [w], [focal]])
        poses.append(np.concatenate([c2w, hwf], axis=1))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"im_{k:03d}.png")
    poses = np.stack(poses)
    poses_disk = np.concatenate(
        [-poses[:, :, 1:2], poses[:, :, 0:1], poses[:, :, 2:]], axis=2)
    bds = np.stack([np.full(n, 1.5), np.full(n, 6.0)], axis=1)
    np.save(root / "poses_bounds.npy",
            np.concatenate([poses_disk.reshape(n, 15), bds], axis=1))
    return str(root)


class TestSpherify:
    def test_spherify_centers_and_normalizes(self, ring_scene_dir):
        scene = load_llff_data(ring_scene_dir, 1, spherify=True)
        # cameras end up on a ~unit sphere around the origin
        radii = np.linalg.norm(scene.poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(radii, radii.mean(), rtol=0.3)
        assert 0.3 < radii.mean() < 3.0
        # circular render path was generated
        assert scene.render_poses.shape[0] > 0

    def test_spherify_poses_function(self, ring_scene_dir):
        scene = load_llff_data(ring_scene_dir, 1, spherify=False)
        poses, render_poses, bds = spherify_poses(
            scene.poses[:, :3, :4], scene.bds)
        assert poses.shape[0] == scene.poses.shape[0]
        assert np.isfinite(poses).all() and np.isfinite(render_poses).all()


class TestNoNdc:
    @pytest.mark.slow
    def test_pipeline_trains_and_renders_no_ndc(self, ring_scene_dir,
                                                tmp_path):
        cfg = Config(
            expname="nondc", basedir=str(tmp_path / "logs"),
            datadir=ring_scene_dir, styledir=str(tmp_path), factor=1.0,
            spherify=True, no_ndc=True,
            netdepth=2, netwidth=16, embed_freq_coor=2, embed_freq_dir=1,
            N_samples=4, N_samples_fine=4, batch_size=64,
            origin_step=5, i_print=100, sigma_noise_std=0.0,
            use_pallas=False,
        )
        pipe = Pipeline(cfg)
        # near/far from scene bounds, not the NDC [0,1]
        assert pipe.near > 0.0 and pipe.far > pipe.near
        pipe.train_nerf()
        psnr = pipe.evaluate()
        assert np.isfinite(psnr)
        pipe.close()
