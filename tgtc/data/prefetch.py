"""Host-side image-decode prefetcher for the 2D trainers.

The reference feeds C1/VAE from torch DataLoaders with worker processes
(/root/reference/trans_train.py:134-141, ``num_workers``); the round-1
port decoded 8x512^2 JPEGs serially on the training thread every step,
stalling the device. This prefetcher double-buffers whole random-crop
batches on a thread pool, so the next batch decodes while the device
runs the current step.

Round-3 additions, both forced by this host exposing ONE core (decode
cannot be parallelized away):

* decoded+resized images are kept in a byte-bounded LRU cache as uint8 —
  typical 2D-stage datasets (tens of nerf_gen frames, a style folder)
  re-decode the same files every epoch, so steady-state per-step host
  work collapses to random crops (memcpy) instead of PNG decodes;
* batches are returned as **uint8** and normalized to [0,1] on DEVICE
  inside the train step — 4× fewer bytes through the (tunneled)
  host→device transfer and zero host-side f32 conversion.

Determinism: batch ``i`` derives its RNG from ``(seed, i)`` regardless of
thread scheduling, so runs reproduce exactly.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from collections import OrderedDict, deque
from typing import List, Optional, Sequence

import numpy as np

_CACHE_BYTES = 512 * 1024 * 1024
_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
_cache_size = 0
_cache_lock = threading.Lock()


def _load_resized(path: str, resize: int) -> np.ndarray:
    """Decode + bilinear-resize to [resize, resize, 3] uint8, LRU-cached."""
    global _cache_size
    key = (path, resize)
    with _cache_lock:
        if key in _cache:
            _cache.move_to_end(key)
            return _cache[key]
    from PIL import Image

    img = Image.open(path).convert("RGB").resize(
        (resize, resize), Image.BILINEAR
    )
    arr = np.asarray(img, np.uint8)
    arr.setflags(write=False)  # crops are views into the shared cache
    with _cache_lock:
        if key not in _cache:
            _cache[key] = arr
            _cache_size += arr.nbytes
            while _cache_size > _CACHE_BYTES and len(_cache) > 1:
                _, old = _cache.popitem(last=False)
                _cache_size -= old.nbytes
    return arr


def load_crop(path: str, rng: np.random.Generator, patch: int,
              resize: int) -> np.ndarray:
    """Reference train_transform: resize (512,512) + RandomCrop(256)
    (/root/reference/trans_train.py:20-26). Returns uint8 — trainers
    normalize on device."""
    arr = _load_resized(path, resize)
    y = rng.integers(0, resize - patch + 1)
    x = rng.integers(0, resize - patch + 1)
    return arr[y : y + patch, x : x + patch]


class CropBatchPrefetcher:
    """Yields [B, P, P, 3] **uint8** random-crop batches, decoding ahead
    (trainers normalize to [0,1] on device).

    ``depth`` batches stay in flight; ``close()`` (or context exit) stops
    the pool. Single-consumer."""

    def __init__(
        self,
        paths: Sequence[str],
        batch: int,
        patch: int = 256,
        resize: int = 512,
        seed: int = 0,
        depth: int = 2,
        workers: int = 4,
    ):
        assert paths, "no images to prefetch"
        self.paths = list(paths)
        self.batch, self.patch, self.resize = batch, patch, resize
        self.seed = seed
        self._i = 0
        self._pool = cf.ThreadPoolExecutor(max_workers=workers)
        self._pending: deque = deque()
        for _ in range(max(1, depth)):
            self._submit()

    def _submit(self) -> None:
        i = self._i
        self._i += 1
        rng = np.random.default_rng([self.seed, i])
        idx = rng.integers(0, len(self.paths), self.batch)
        futs = [
            self._pool.submit(
                load_crop, self.paths[k],
                np.random.default_rng([self.seed, i, j]),
                self.patch, self.resize,
            )
            for j, k in enumerate(idx)
        ]
        self._pending.append(futs)

    def next(self) -> np.ndarray:
        futs = self._pending.popleft()
        self._submit()
        return np.stack([f.result() for f in futs], 0)

    def close(self) -> None:
        for futs in self._pending:
            for f in futs:
                f.cancel()
        self._pending.clear()
        self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
