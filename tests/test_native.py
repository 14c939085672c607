"""Native runtime (C++ PNG writer / resizer) tests, with fallback parity."""

import os

import numpy as np
import pytest

from tgtc.utils import native


class TestNativeRuntime:
    def test_library_builds(self):
        lib = native.get_lib()
        assert lib is not None, "g++ build of native/tgtc_runtime.cpp failed"

    def test_png_roundtrip(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        img = (rng.uniform(size=(33, 47, 3)) * 255).astype(np.uint8)
        path = str(tmp_path / "x.png")
        native.write_png(path, img)
        back = np.asarray(Image.open(path).convert("RGB"))
        np.testing.assert_array_equal(back, img)

    def test_async_writes_complete(self, tmp_path):
        rng = np.random.default_rng(1)
        paths = []
        for i in range(12):
            img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
            p = str(tmp_path / f"f{i}.png")
            native.write_png_async(p, img)
            paths.append(p)
        errs = native.wait_writes()
        assert errs == 0
        from PIL import Image

        for p in paths:
            assert os.path.exists(p)
            assert Image.open(p).size == (64, 64)

    def test_float_input_conversion(self, tmp_path):
        img = np.linspace(0, 1, 24 * 24 * 3, dtype=np.float32).reshape(24, 24, 3)
        p = str(tmp_path / "f.png")
        native.write_png(p, img)
        assert os.path.exists(p)

    def test_resize_box_matches_numpy(self):
        rng = np.random.default_rng(2)
        img = (rng.uniform(size=(32, 48, 3)) * 255).astype(np.uint8)
        out = native.resize_box(img, 4)
        assert out.shape == (8, 12, 3)
        ref = (
            img.reshape(8, 4, 12, 4, 3).astype(np.uint32).mean(axis=(1, 3))
        )
        # integer division in native vs float mean: allow 1-lsb difference
        assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1
