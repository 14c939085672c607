"""CropBatchPrefetcher: determinism, shapes, and crop-bounds invariants
(the overlapped-decode replacement for the reference's DataLoader workers,
/root/reference/trans_train.py:134-141)."""

import numpy as np
import pytest

from tgtc.data.prefetch import CropBatchPrefetcher, load_crop


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.uniform(size=(40 + i, 50, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    return str(d)


def _paths(image_dir):
    import os

    return sorted(os.path.join(image_dir, f) for f in os.listdir(image_dir))


class TestPrefetcher:
    def test_shapes_and_range(self, image_dir):
        with CropBatchPrefetcher(_paths(image_dir), batch=4, patch=16,
                                 resize=32, seed=1) as pf:
            for _ in range(3):
                b = pf.next()
                assert b.shape == (4, 16, 16, 3)
                # uint8 since round 3 — trainers normalize on device
                assert b.dtype == np.uint8

    def test_deterministic_across_instances(self, image_dir):
        with CropBatchPrefetcher(_paths(image_dir), batch=3, patch=16,
                                 resize=32, seed=7) as a:
            seq_a = [a.next() for _ in range(4)]
        with CropBatchPrefetcher(_paths(image_dir), batch=3, patch=16,
                                 resize=32, seed=7, depth=3, workers=2) as b:
            seq_b = [b.next() for _ in range(4)]
        for x, y in zip(seq_a, seq_b):
            np.testing.assert_array_equal(x, y)

    def test_seed_changes_stream(self, image_dir):
        with CropBatchPrefetcher(_paths(image_dir), batch=3, patch=16,
                                 resize=32, seed=7) as a, \
             CropBatchPrefetcher(_paths(image_dir), batch=3, patch=16,
                                 resize=32, seed=8) as b:
            assert not np.array_equal(a.next(), b.next())

    def test_load_crop_matches_reference_transform(self, image_dir):
        """resize(512,512)+RandomCrop semantics: full-coverage crop when
        patch == resize."""
        p = _paths(image_dir)[0]
        rng = np.random.default_rng(0)
        out = load_crop(p, rng, patch=32, resize=32)
        from PIL import Image

        want = np.asarray(
            Image.open(p).convert("RGB").resize((32, 32), Image.BILINEAR),
            np.uint8)
        np.testing.assert_array_equal(out, want)
