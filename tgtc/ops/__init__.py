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

# NOTE: tgtc.ops.sampling.merge_two_sorted is a documented experiment
# (rank-merge vs jnp.sort, BASELINE.md) kept out of the public API — the
# production renderers deliberately use jnp.sort, which fuses better.
from tgtc.ops.composite import alpha_composite, alpha_composite_wild
from tgtc.ops.losses import img2mse, mse2psnr, img2l1, l2_norm, cosine_similarity
from tgtc.ops.style import (
    adaptive_instance_normalization,
    calc_mean_std,
    coral,
    gram_matrix,
    gram_style_loss,
    mean_variance_norm,
)
from tgtc.ops.rasterize import (
    llff_projection_matrix,
    ndc_to_world,
    rasterize_pyramid,
    rasterize_warp,
    splat_points,
    world_to_cvv,
)

__all__ = [
    "positional_encoding",
    "encoding_dim",
    "sample_along_rays_uniform",
    "sample_pdf",
    "merge_and_resample_fine",
    "alpha_composite",
    "alpha_composite_wild",
    "img2mse",
    "mse2psnr",
    "img2l1",
    "l2_norm",
    "cosine_similarity",
    "adaptive_instance_normalization",
    "calc_mean_std",
    "coral",
    "gram_matrix",
    "gram_style_loss",
    "mean_variance_norm",
    "llff_projection_matrix",
    "ndc_to_world",
    "rasterize_pyramid",
    "rasterize_warp",
    "splat_points",
    "world_to_cvv",
]
