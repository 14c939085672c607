"""Functional volume-rendering math core (pure jnp, no model state).

TPU-native rewrite of the reference's functional layer
(`/root/reference/utils.py:354-609`): every function is shape-static,
key-threaded, and safe to call under `jax.jit` / `shard_map`.
"""

from tgtc.ops.encoding import positional_encoding, encoding_dim
from tgtc.ops.sampling import (
    sample_along_rays_uniform,
    sample_pdf,
    merge_and_resample_fine,
)
from tgtc.ops.composite import alpha_composite
from tgtc.ops.losses import img2mse, mse2psnr, img2l1, l2_norm, cosine_similarity

__all__ = [
    "positional_encoding",
    "encoding_dim",
    "sample_along_rays_uniform",
    "sample_pdf",
    "merge_and_resample_fine",
    "alpha_composite",
    "img2mse",
    "mse2psnr",
    "img2l1",
    "l2_norm",
    "cosine_similarity",
]
