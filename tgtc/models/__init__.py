"""Neural modules: NeRF trunk, 3D style field, VAE, and the 2D style stack."""

from tgtc.models.nerf import NerfMLP, NerfConfig, make_nerf, nerf_apply

__all__ = ["NerfMLP", "NerfConfig", "make_nerf", "nerf_apply"]
