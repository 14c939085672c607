"""3D IO utilities + nearby-camera batching."""

import numpy as np

from tgtc.utils.io3d import dep2pcl, read_ply, write_ply_rgb
from tgtc.data.style_dataset import nearby_camera_batch


class TestPly:
    def test_roundtrip_with_colors(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = (rng.uniform(size=(100, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "x.ply")
        write_ply_rgb(p, pts, cols)
        pts2, cols2 = read_ply(p)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_array_equal(cols2, cols)

    def test_roundtrip_no_colors(self, tmp_path):
        pts = np.arange(30, dtype=np.float32).reshape(10, 3)
        p = str(tmp_path / "y.ply")
        write_ply_rgb(p, pts)
        pts2, cols2 = read_ply(p)
        np.testing.assert_array_equal(pts2, pts)
        assert cols2 is None


class TestDep2Pcl:
    def test_center_pixel_on_axis(self):
        h, w, f = 11, 11, 10.0
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        depth = np.full((h, w), 2.0, np.float32)
        pts = dep2pcl(depth, K, np.eye(4))
        center = pts.reshape(h, w, 3)[h // 2, w // 2]
        np.testing.assert_allclose(center, [-0.1, 0.1, -2.0], atol=0.11)

    def test_pose_applied(self):
        h = w = 4
        K = np.array([[4.0, 0, 2], [0, 4.0, 2], [0, 0, 1]], np.float32)
        depth = np.ones((h, w), np.float32)
        c2w = np.eye(4)
        c2w[:3, 3] = [5, 6, 7]
        pts = dep2pcl(depth, K, c2w)
        assert np.all(np.abs(pts[:, 0] - 5) < 1.0)
        assert np.all(np.abs(pts[:, 2] - 6.0) < 1.5)


class TestNearbyCameras:
    def test_batch_shape_and_anchor_first(self):
        rng = np.random.default_rng(0)
        cps = np.tile(np.eye(4, dtype=np.float32)[None], (10, 1, 1))
        cps[:, 0, 3] = np.arange(10)
        ids = nearby_camera_batch(cps, 4, rng)
        assert ids.shape == (4,)
        assert all(0 <= i < 10 for i in ids)

    def test_prefers_nearby(self):
        rng = np.random.default_rng(1)
        cps = np.tile(np.eye(4, dtype=np.float32)[None], (50, 1, 1))
        cps[:, 0, 3] = np.arange(50) * 10.0  # spread far apart
        counts = np.zeros(50)
        for _ in range(200):
            ids = nearby_camera_batch(cps, 5, rng)
            anchor = ids[0]
            d = np.abs(cps[ids[1:], 0, 3] - cps[anchor, 0, 3])
            counts[ids[1:]] += 1
            # most companions within a few neighbors of the anchor
        # statistical: average companion distance much smaller than random
        # (random mean gap ~167 for uniform over 0..490)
        dists = []
        rng2 = np.random.default_rng(2)
        for _ in range(200):
            ids = nearby_camera_batch(cps, 5, rng2)
            dists.append(np.mean(np.abs(cps[ids[1:], 0, 3]
                                        - cps[ids[0], 0, 3])))
        assert np.mean(dists) < 120


class TestGrabBagIO:
    def test_obj_roundtrip_text(self, tmp_path):
        from tgtc.utils.io3d import write_obj

        v = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]])
        f = np.array([[1, 2, 3]])
        p = tmp_path / "m.obj"
        write_obj(str(p), v, f)
        lines = p.read_text().splitlines()
        assert lines[0].startswith("v 0.0") and lines[-1] == "f 1 2 3"

    def test_ply_xyz(self, tmp_path):
        from tgtc.utils.io3d import write_ply_xyz

        p = tmp_path / "pc.ply"
        write_ply_xyz(str(p), np.zeros((4, 3)))
        txt = p.read_text()
        assert "element vertex 4" in txt and txt.count("0.0 0.0 0.0") == 4

    def test_rgbd_json_roundtrip(self, tmp_path):
        from PIL import Image

        from tgtc.utils.io3d import json_read_rgbd, json_save_depth, read_rgbd

        depth = np.linspace(0, 5, 12, dtype=np.float32).reshape(3, 4)
        dpath = tmp_path / "d.json"
        json_save_depth(str(dpath), depth)
        rgb = (np.random.default_rng(0).uniform(size=(3, 4, 3)) * 255
               ).astype(np.uint8)
        rpath = tmp_path / "rgb.png"
        Image.fromarray(rgb).save(rpath)
        d2, r2 = json_read_rgbd(str(dpath), str(rpath))
        np.testing.assert_allclose(d2, depth, atol=1e-5)
        assert r2.shape == (3, 4, 3)
        d3, r3 = read_rgbd(str(rpath), str(rpath))  # any image as depth
        assert d3.shape[:2] == r3.shape[:2]

    def test_camera_json_roundtrip(self, tmp_path):
        import json

        from tgtc.utils.io3d import (
            json_read_camera_parameters,
            json_save_camera_parameters,
            read_frame_pose,
        )

        cp = np.arange(16, dtype=np.float64).reshape(4, 4)
        intr = np.arange(9, dtype=np.float64).reshape(3, 3)
        p = tmp_path / "cam.json"
        json_save_camera_parameters(str(p), cp, intr)
        cp2, intr2 = json_read_camera_parameters(str(p))
        np.testing.assert_array_equal(cp, cp2)
        np.testing.assert_array_equal(intr, intr2)

        fp = tmp_path / "frame_00000.json"
        fp.write_text(json.dumps({
            "projectionMatrix": list(range(16)),
            "intrinsics": list(range(9)),
            "cameraPoseARFrame": list(range(16)),
            "time": 1.5, "frame_index": 7,
        }))
        proj, k, pose, t, idx = read_frame_pose(str(fp))
        assert proj.shape == (4, 4) and k.shape == (3, 3)
        assert t == 1.5 and idx == 7
