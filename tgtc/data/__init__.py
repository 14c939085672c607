"""Scene/data loading and device-resident ray pipelines."""

from tgtc.data.rays import generate_rays, ndc_rays, rays_for_poses
from tgtc.data.llff import load_llff_data, LlffScene

__all__ = [
    "generate_rays",
    "ndc_rays",
    "rays_for_poses",
    "load_llff_data",
    "LlffScene",
]
