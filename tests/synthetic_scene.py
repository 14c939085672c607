"""Synthetic tiny LLFF scene builder shared by conftest fixtures and the
multi-host worker processes (which run outside pytest)."""

import numpy as np


def make_synthetic_llff_scene(root, n=8, h=32, w=40, focal=50.0) -> str:
    """Write an ``images/`` dir + ``poses_bounds.npy`` LLFF scene under
    ``root`` (8 views of a colored gradient by default). The poses on disk
    carry the *inverse* LLFF axis fix so the loader reproduces the intended
    camera-to-world matrices exactly."""
    import os

    from PIL import Image

    root = str(root)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)

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
        Image.fromarray(img).save(os.path.join(imgdir, f"img_{k:03d}.png"))

    poses = np.stack(poses)  # [N,3,5]
    # loader does [p[:,:,1:2], -p[:,:,0:1], p[:,:,2:]]; inverse is
    # [-p[:,:,1:2], p[:,:,0:1], p[:,:,2:]].
    poses_disk = np.concatenate(
        [-poses[:, :, 1:2], poses[:, :, 0:1], poses[:, :, 2:]], axis=2
    )
    bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], axis=1)
    arr = np.concatenate([poses_disk.reshape(n, 15), bds], axis=1)
    np.save(os.path.join(root, "poses_bounds.npy"), arr)
    return root
