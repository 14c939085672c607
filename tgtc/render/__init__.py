"""Volume-rendering pipeline: coarse→fine render step and bulk renderers."""

from tgtc.render.volume import render_rays, RenderSettings

__all__ = ["render_rays", "RenderSettings"]
