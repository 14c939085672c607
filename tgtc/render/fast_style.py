"""Fast fused stylized render pipeline (Phase F hot path).

Coarse→fine stylized render where each pass is ONE fused Pallas kernel
(tgtc.ops.pallas.style_kernel: trunk + concat MLP + style MLP, all weights
VMEM-resident). This drives the second headline metric — stylized
frames/min at full LLFF resolution — replacing the reference's chunked
multi-network chain (/root/reference/rendering.py:93-239).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tgtc.models.style_field import lookup_latents
from tgtc.ops.composite import alpha_composite, sigma_weights
from tgtc.ops.pallas.style_kernel import (
    fused_sigma_apply_t,
    fused_style_apply_t,
    pack_style_params,
)
from tgtc.ops.sampling import sample_along_rays_uniform, sample_pdf
from tgtc.render.fast import _points_t
from tgtc.render.volume import RenderSettings


def make_fused_style_render_fn(
    settings: RenderSettings,
    depth: int = 8,
    num_freq_coor: int = 10,
    style_d: int = 8,
    style_width: int = 256,
    latent_dim: int = 32,
    sigma_scale: float = 1.0,
    llff_tile: bool = True,
    tile: int = 2048,
    interpret: bool = False,
    trunk_width: int = 256,
    depth_fine: int = None,
    trunk_width_fine: int = None,
    coarse_rgb: bool = True,
    fine_budget: int = None,
    coarse_share: int = 1,
    grid_spec=None,
    proposal_dims: dict = None,
):
    """Jitted ``(packed_c(4), packed_f(4), latent_state, rays_o, rays_d,
    style_ids, frame_ids, key) → {"rgb", "t_exp"}`` renderer.

    ``grid_spec`` (tgtc.render.grid.GridSpec): density-grid proposal — the
    coarse trunk never runs; σ is gathered from a voxel snapshot of the
    frozen fine density and the render takes one extra trailing operand
    ``grid_values``. Requires ``coarse_rgb=False``. Valid for Phase F
    because the NeRF density is frozen after Phase A — the style field
    only recolors (same argument as render.fast's grid_spec).

    ``proposal_dims`` (``{"depth", "width", "num_freq_coor"}``): distilled
    proposal MLP (render.distill) — the coarse style trunk never runs; σ
    comes from a tiny MXU-shaped trunk fitted to the frozen fine density,
    and the render takes three extra trailing operands (the proposal's
    packed ``w1/w2/enc``, pack_nerf_params layout). Requires
    ``coarse_rgb=False``; mutually exclusive with ``grid_spec``.

    ``depth_fine``/``trunk_width_fine`` size the fine NeRF trunk separately
    (reference /root/reference/models.py:202-205); default = coarse dims.
    ``fine_budget``: early ray termination — run the fine style chain on
    only the N highest-estimated-contribution merged samples per ray
    (ops.sampling.select_sample_budget); None = exact parity.
    ``coarse_share``: shared coarse proposal — run the sigma-only coarse
    pass on every N-th ray and share the resampled/selected depth set
    across each group of N consecutive (scanline-adjacent) rays; the fine
    style chain still evaluates every ray's own points. Same semantics and
    quality methodology as render.fast's flag; requires
    ``coarse_rgb=False``. 1 (default) = exact parity."""
    nc = settings.n_samples
    nf = settings.n_samples + settings.n_samples_fine
    if fine_budget is not None and not 0 < fine_budget <= nf:
        raise ValueError(f"fine_budget {fine_budget} not in (0, {nf}]")
    if fine_budget == nf:
        fine_budget = None
    if coarse_share < 1:
        raise ValueError(f"coarse_share {coarse_share} must be >= 1")
    if coarse_share > 1 and coarse_rgb:
        raise ValueError("coarse_share > 1 requires coarse_rgb=False: the "
                         "shared coarse pass is a sampling proposal, not a "
                         "per-ray coarse image")
    if grid_spec is not None and coarse_rgb:
        raise ValueError("grid_spec requires coarse_rgb=False: the density"
                         "-grid proposal has no coarse radiance")
    if proposal_dims is not None and coarse_rgb:
        raise ValueError("proposal_dims requires coarse_rgb=False: the "
                         "distilled proposal has no coarse radiance")
    if proposal_dims is not None and grid_spec is not None:
        raise ValueError("proposal_dims and grid_spec are both frozen-"
                         "density proposals: pick one")

    kw = dict(depth=depth, num_freq_coor=num_freq_coor, style_d=style_d,
              style_width=style_width, latent_dim=latent_dim,
              trunk_width=trunk_width, tile=tile, interpret=interpret)
    kw_f = dict(kw, depth=depth_fine or depth,
                trunk_width=trunk_width_fine or trunk_width)

    @jax.jit
    def render(wtc, wsc, wgc, encc, wtf, wsf, wgf, encf,
               latent_state, rays_o, rays_d, style_ids, frame_ids, key,
               grid_values=None, prop_w1=None, prop_w2=None, prop_enc=None):
        r = rays_o.shape[0]
        lat = lookup_latents(latent_state, style_ids, frame_ids,
                             sigma_scale, llff_tile)          # [R, L]

        def run(packed, ts, kw, deltas=None):
            s = ts.shape[1]
            pt, _ = _points_t(rays_o, rays_d, ts)
            lat_t = jnp.broadcast_to(
                lat.T[:, :, None], (latent_dim, r, s)
            ).reshape(latent_dim, r * s)
            rgb_t, sigma_t = fused_style_apply_t(*packed, pt, lat_t, **kw)
            rgb = rgb_t.reshape(3, r, s).transpose(1, 2, 0)
            sigma = sigma_t.reshape(r, s)
            return alpha_composite(rgb, sigma, ts,
                                   white_bkgd=settings.white_bkgd,
                                   deltas=deltas), sigma

        if r % coarse_share:
            raise ValueError(
                f"ray count {r} not divisible by coarse_share {coarse_share}"
            )
        ro_c = rays_o[::coarse_share]
        rd_c = rays_d[::coarse_share]
        rc = ro_c.shape[0]
        pts_c, ts = sample_along_rays_uniform(
            ro_c, rd_c, nc, near=settings.near, far=settings.far,
            key=key,  # perturb=True at render, reference parity
        )
        if proposal_dims is not None:
            # distilled proposal: σ from the tiny MXU-shaped trunk fitted
            # to the frozen fine density (render.distill) — the coarse
            # style chain never runs
            from tgtc.ops.pallas.nerf_mlp import fused_nerf_sigma_apply_t

            pt, _ = _points_t(ro_c, rd_c, ts)
            sig_t = fused_nerf_sigma_apply_t(
                prop_w1, prop_w2, prop_enc, pt,
                depth=proposal_dims["depth"],
                num_freq_coor=proposal_dims["num_freq_coor"],
                width=proposal_dims["width"], tile=tile,
                interpret=interpret)
            sigma_c = sig_t.reshape(rc, nc)
            weights_c = sigma_weights(sigma_c, ts)
        elif grid_spec is not None:
            # density-grid proposal: gather σ from the frozen-density
            # snapshot (perturbed sample points are fine — the grid is a
            # continuous trilinear field)
            from tgtc.render.grid import sample_sigma_grid

            sigma_c = sample_sigma_grid(grid_values, grid_spec, pts_c)
            weights_c = sigma_weights(sigma_c, ts)
        elif coarse_rgb:
            comp_c, sigma_c = run((wtc, wsc, wgc, encc), ts, kw)
            weights_c = comp_c.weights
        else:
            # sigma-only coarse: sample_pdf needs nothing but the
            # compositing weights, so skip the whole style chain
            # (~63% of the coarse pass's MXU passes). Identical fine
            # result — asserted in tests/test_style_kernel.py.
            pt, _ = _points_t(ro_c, rd_c, ts)
            sig_t = fused_sigma_apply_t(
                wtc, wgc, encc, pt, depth=kw["depth"],
                num_freq_coor=num_freq_coor, trunk_width=trunk_width,
                tile=tile, interpret=interpret)
            sigma_c = sig_t.reshape(rc, nc)
            weights_c = sigma_weights(sigma_c, ts)

        ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
        t_new = sample_pdf(ts_mid, weights_c[..., 1:-1],
                           settings.n_samples_fine)
        # NOTE: rank-merge beats sort standalone (3.6 vs 4.9 ms) but
        # LOSES in the fused pipeline (bench 515k vs 534k rays/s — the
        # one-hot intermediates break XLA's fusion here); keep the sort
        ts_f = jnp.sort(jnp.concatenate([ts, t_new], axis=-1), axis=-1)
        if fine_budget is not None:
            from tgtc.ops.sampling import select_sample_budget

            # no grid=: this path's coarse depths are per-ray perturbed
            ts_f, deltas_f = select_sample_budget(
                ts_f, ts, sigma_c, fine_budget)
        else:
            deltas_f = None
        if coarse_share > 1:
            def expand(x):
                k = x.shape[-1]
                return jnp.broadcast_to(
                    x[:, None, :], (rc, coarse_share, k)
                ).reshape(r, k)

            ts_f = expand(ts_f)
            if deltas_f is not None:
                deltas_f = expand(deltas_f)
        comp_f, _ = run((wtf, wsf, wgf, encf), ts_f, kw_f, deltas=deltas_f)

        out = {"rgb": comp_f.rgb, "t_exp": comp_f.t_exp}
        if coarse_rgb:
            out["rgb_coarse"] = comp_c.rgb
        return out

    return render


@dataclasses.dataclass
class FusedStyleRenderer:
    """Holds packed kernel weights for coarse+fine stylized rendering."""

    packed_coarse: Tuple[jnp.ndarray, ...]
    packed_fine: Tuple[jnp.ndarray, ...]
    latent_state: Dict[str, jnp.ndarray]
    settings: RenderSettings
    depth: int = 8
    num_freq_coor: int = 10
    style_d: int = 8
    style_width: int = 256
    latent_dim: int = 32
    sigma_scale: float = 1.0
    llff_tile: bool = True
    tile: int = 2048
    interpret: bool = False
    trunk_width: int = 256
    depth_fine: int = None
    trunk_width_fine: int = None
    coarse_rgb: bool = True
    fine_budget: int = None
    coarse_share: int = 1
    sigma_grid: Optional[Tuple[jnp.ndarray, Any]] = None  # (values, GridSpec)
    proposal: Optional[Tuple[Tuple, dict]] = None  # (packed w1/w2/enc, dims)

    def __post_init__(self):
        self._fn = make_fused_style_render_fn(
            self.settings, self.depth, self.num_freq_coor, self.style_d,
            self.style_width, self.latent_dim, self.sigma_scale,
            self.llff_tile, self.tile, self.interpret, self.trunk_width,
            self.depth_fine, self.trunk_width_fine, self.coarse_rgb,
            self.fine_budget, self.coarse_share,
            grid_spec=self.sigma_grid[1] if self.sigma_grid else None,
            proposal_dims=self.proposal[1] if self.proposal else None,
        )

    @classmethod
    def from_params(
        cls, nerf_params_coarse, nerf_params_fine, concat_params,
        style_params, latent_state, settings: RenderSettings,
        depth: int = 8, num_freq_coor: int = 10, style_d: int = 8,
        style_width: int = 256, latent_dim: int = 32,
        sigma_scale: float = 1.0, llff_tile: bool = True,
        tile: int = 2048, interpret: bool = False, trunk_width: int = 256,
        depth_fine: int = None, trunk_width_fine: int = None,
        coarse_rgb: bool = True, fine_budget: int = None,
        coarse_share: int = 1, sigma_grid=None, proposal=None,
    ) -> "FusedStyleRenderer":
        """``proposal``: ``(params, depth, width, num_freq_dir)`` — a raw
        distilled-proposal NerfMLP (render.distill); packed here with
        pack_nerf_params and used in place of the coarse style trunk."""
        pk = lambda npar, d, w: pack_style_params(
            npar, concat_params, style_params, depth=d,
            num_freq_coor=num_freq_coor, style_d=style_d,
            style_width=style_width, latent_dim=latent_dim,
            trunk_width=w,
        )
        if proposal is not None:
            from tgtc.ops.pallas.nerf_mlp import pack_nerf_params

            p_par, p_depth, p_width, p_nfd = proposal
            proposal = (
                pack_nerf_params(p_par, depth=p_depth,
                                 num_freq_coor=num_freq_coor,
                                 num_freq_dir=p_nfd, width=p_width),
                dict(depth=p_depth, width=p_width,
                     num_freq_coor=num_freq_coor),
            )
        return cls(pk(nerf_params_coarse, depth, trunk_width),
                   pk(nerf_params_fine, depth_fine or depth,
                      trunk_width_fine or trunk_width),
                   latent_state, settings, depth, num_freq_coor, style_d,
                   style_width, latent_dim, sigma_scale, llff_tile, tile,
                   interpret, trunk_width, depth_fine, trunk_width_fine,
                   coarse_rgb, fine_budget, coarse_share,
                   sigma_grid=sigma_grid, proposal=proposal)

    def render(self, rays_o, rays_d, style_ids, frame_ids, key):
        if self.proposal is not None:
            return self._fn(*self.packed_coarse, *self.packed_fine,
                            self.latent_state, rays_o, rays_d, style_ids,
                            frame_ids, key, None, *self.proposal[0])
        if self.sigma_grid is not None:
            return self._fn(*self.packed_coarse, *self.packed_fine,
                            self.latent_state, rays_o, rays_d, style_ids,
                            frame_ids, key, self.sigma_grid[0])
        return self._fn(*self.packed_coarse, *self.packed_fine,
                        self.latent_state, rays_o, rays_d, style_ids,
                        frame_ids, key)
