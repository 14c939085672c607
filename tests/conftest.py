"""Test harness: force CPU platform with 8 virtual devices so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware —
the JAX-native analog of the reference's (absent) multi-node testing
(SURVEY.md §4)."""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the TPU ('axon') platform and
# overwrites JAX_PLATFORMS, so the env var alone is not enough — override the
# config knob before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cpu_mesh8():
    """8-virtual-device CPU mesh for multi-chip sharding tests."""
    from tgtc.parallel import get_mesh

    assert len(jax.devices()) == 8
    return get_mesh()

@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_llff_dir(tmp_path_factory):
    """A tiny on-disk LLFF-like scene (8 views of a colored gradient) for
    loader and end-to-end smoke tests."""
    from PIL import Image

    root = tmp_path_factory.mktemp("llff_scene")
    imgdir = root / "images"
    imgdir.mkdir()
    n, h, w = 8, 32, 40
    focal = 50.0
    rng = np.random.default_rng(42)

    poses = []
    for k in range(n):
        # forward-facing cameras, slightly translated, looking down -z
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0.02 * (k - n / 2), 0.01 * (k % 3), 4.0 + 0.03 * k]
        hwf = np.array([[h], [w], [focal]])
        poses.append(np.concatenate([c2w, hwf], axis=1))  # [3,5]
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        img[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        img[..., 2] = (k * 30) % 255
        Image.fromarray(img).save(imgdir / f"img_{k:03d}.png")

    poses = np.stack(poses)  # [N,3,5]
    # undo the loader's axis fix so the loader reproduces `poses` exactly:
    # loader does [p[:,:,1:2], -p[:,:,0:1], p[:,:,2:]]; inverse is
    # [-p[:,:,1:2], p[:,:,0:1], p[:,:,2:]].
    poses_disk = np.concatenate(
        [-poses[:, :, 1:2], poses[:, :, 0:1], poses[:, :, 2:]], axis=2
    )
    bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], axis=1)
    arr = np.concatenate([poses_disk.reshape(n, 15), bds], axis=1)
    np.save(root / "poses_bounds.npy", arr)
    return str(root)


@pytest.fixture
def private_llff_dir(synthetic_llff_dir, tmp_path):
    """Per-test copy of the synthetic scene. The pipeline writes
    ``stylized_gen_{factor}/`` INTO the scene dir (reference layout,
    /root/reference/dataset.py:438) and ``ensure_style2d`` skip-if-exists
    resumes on it — so tests that RUN the 2D stack must not share the
    session-scoped scene dir, or whichever runs first short-circuits the
    rest (the C1-collage assertion caught exactly that)."""
    import glob
    import shutil

    scene_dir = str(tmp_path / "scene")
    shutil.copytree(synthetic_llff_dir, scene_dir)
    for leftover in glob.glob(os.path.join(scene_dir, "stylized_gen_*")):
        shutil.rmtree(leftover)
    return scene_dir
