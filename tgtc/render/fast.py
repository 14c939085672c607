"""Fast fused render pipeline: Pallas trunk + XLA sampling/compositing.

The bulk-render path (Phase B geometry dump, Phase F novel-view renders,
benchmark) — replaces the reference's chunked ``batchify`` render loop
(/root/reference/rendering.py:27-51) with one jitted program per ray block:

    stratified sample → fused Pallas MLP (coarse) → composite →
    inverse-CDF resample → fused Pallas MLP (fine) → composite

Points are *built in feature-major layout* ``[3, R*S]`` directly from the
ray tensors (no transpose of a large buffer), matching the kernel's VMEM
tiling (see tgtc.ops.pallas.nerf_mlp).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tgtc.ops.composite import alpha_composite, sigma_weights
from tgtc.ops.pallas.nerf_mlp import (
    fused_nerf_apply_t,
    fused_nerf_sigma_apply_t,
    pack_nerf_params,
)
from tgtc.ops.sampling import (
    sample_along_rays_uniform, sample_pdf, select_sample_budget,
)
from tgtc.render.volume import RenderSettings


def _points_t(rays_o: jnp.ndarray, rays_d: jnp.ndarray, ts: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build feature-major pts/dirs [3, R*S] from rays [R,3] + depths [R,S]."""
    r, s = ts.shape
    # [3, R, S] = [3, R, 1] + [1, R, S] * [3, R, 1]
    o = rays_o.T[:, :, None]
    d = rays_d.T[:, :, None]
    pts = (o + ts[None] * d).reshape(3, r * s)
    dirs = jnp.broadcast_to(d, (3, r, s)).reshape(3, r * s)
    return pts, dirs


def make_fused_render_fn(
    settings: RenderSettings,
    tile: int = 4096,
    interpret: bool = False,
    depth: int = 8,
    num_freq_coor: int = 10,
    num_freq_dir: int = 4,
    width: int = 256,
    depth_fine: int = None,
    width_fine: int = None,
    coarse_rgb: bool = True,
    fine_budget: int = None,
    coarse_share: int = 1,
    grid_spec=None,
):
    """Build a jitted ``(w1c, w2c, encc, w1f, w2f, encf, rays_o, rays_d) ->
    outputs`` render function using the fused trunk kernel for both passes.

    ``grid_spec`` (a ``tgtc.render.grid.GridSpec``): density-grid proposal —
    the coarse MLP never runs; σ along each proposal ray is gathered from a
    precomputed voxel snapshot of the fine density (render.grid), and the
    render function takes one extra trailing operand ``grid_values``
    ``[Gx, Gy, Gz]``. Requires ``coarse_rgb=False`` (there is no coarse
    radiance). Composable with ``fine_budget`` and ``coarse_share``. The
    reference re-evaluates its coarse MLP on all 64 uniform samples of
    every ray of every frame (/root/reference/rendering.py:27-36).

    ``depth_fine``/``width_fine`` default to the coarse dims; the reference
    sizes the fine net separately (/root/reference/models.py:202-205).

    ``fine_budget``: early ray termination / empty-space skip — evaluate
    the fine MLP on only the ``fine_budget`` highest-estimated-contribution
    merged samples per ray (see ops.sampling.select_sample_budget). None
    (default) keeps exact parity with the reference's evaluate-all path
    (/root/reference/utils.py:354-386).

    ``coarse_share``: shared coarse proposal — evaluate the coarse σ pass
    on every ``coarse_share``-th ray only and share its importance weights
    (hence resampled/selected depths) across each group of ``coarse_share``
    CONSECUTIVE rays; the fine MLP still evaluates every ray's own 3-D
    points. Rays are image pixels in scanline order at render time, so a
    group is horizontally adjacent pixels with near-identical depth
    distributions (a group never straddles a row iff the image width is
    divisible by ``coarse_share`` — 1008 satisfies it for 2 and 4; a
    straddling group merely weakens the neighbor-similarity assumption
    for that group, it does not error).
    The coarse pass exists only to steer fine sampling, exactly like a
    low-res proposal network. 1 (default) = exact parity; >1 requires
    ``coarse_rgb=False`` (a per-ray coarse image is no longer defined).

    Ray count must make (R/coarse_share)*Nc and R*(Nc+Nf) multiples of
    ``tile`` (R a multiple of tile*coarse_share works since Nc, Nc+Nf are
    powers of two / even).
    """
    nc, nf = settings.n_samples, settings.n_samples + settings.n_samples_fine
    if fine_budget is not None and not 0 < fine_budget <= nf:
        raise ValueError(f"fine_budget {fine_budget} not in (0, {nf}]")
    if fine_budget == nf:
        fine_budget = None  # full budget: take the exact path
    if coarse_share < 1:
        raise ValueError(f"coarse_share {coarse_share} must be >= 1")
    if coarse_share > 1 and coarse_rgb:
        raise ValueError("coarse_share > 1 requires coarse_rgb=False: the "
                         "shared coarse pass is a sampling proposal, not a "
                         "per-ray coarse image")
    if grid_spec is not None and coarse_rgb:
        raise ValueError("grid_spec requires coarse_rgb=False: the density"
                         "-grid proposal has no coarse radiance")
    kw = dict(depth=depth, num_freq_coor=num_freq_coor,
              num_freq_dir=num_freq_dir, width=width, tile=tile,
              interpret=interpret)
    kw_f = dict(kw, depth=depth_fine or depth, width=width_fine or width)

    @jax.jit
    def render(w1c, w2c, encc, w1f, w2f, encf, rays_o, rays_d,
               grid_values=None):
        r = rays_o.shape[0]
        if r % coarse_share:
            raise ValueError(
                f"ray count {r} not divisible by coarse_share {coarse_share}"
            )
        # coarse proposal rays: all of them, or one representative per
        # group of coarse_share consecutive (scanline-adjacent) rays
        ro_c = rays_o[::coarse_share]
        rd_c = rays_d[::coarse_share]
        rc = ro_c.shape[0]
        pts_c, ts = sample_along_rays_uniform(
            ro_c, rd_c, nc, near=settings.near, far=settings.far
        )
        if grid_spec is not None:
            # density-grid proposal: σ comes from the voxel snapshot of
            # the (frozen) fine density — the coarse MLP is skipped
            # entirely (24% of exact block time, BASELINE.md round-3
            # bisect); the proposal machinery below is unchanged
            from tgtc.render.grid import sample_sigma_grid

            sigma_c = sample_sigma_grid(grid_values, grid_spec, pts_c)
            weights_c = sigma_weights(sigma_c, ts)
        elif coarse_rgb:
            pt, dt = _points_t(ro_c, rd_c, ts)
            rgb_t, sigma_t = fused_nerf_apply_t(w1c, w2c, encc, pt, dt, **kw)
            rgb_c = rgb_t.reshape(3, rc, nc).transpose(1, 2, 0)
            sigma_c = sigma_t.reshape(rc, nc)
            comp_c = alpha_composite(rgb_c, sigma_c, ts,
                                     white_bkgd=settings.white_bkgd)
            weights_c = comp_c.weights
        else:
            # sigma-only coarse: importance weights need no radiance —
            # skip dirs encoding, base_remap, and the rgb branch.
            # Identical fine image (tests/test_pallas_kernel.py).
            pt, _ = _points_t(ro_c, rd_c, ts)
            sig_t = fused_nerf_sigma_apply_t(
                w1c, w2c, encc, pt, depth=kw["depth"],
                num_freq_coor=num_freq_coor, width=width, tile=tile,
                interpret=interpret)
            sigma_c = sig_t.reshape(rc, nc)
            weights_c = sigma_weights(sigma_c, ts)
        del pts_c

        ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
        t_new = sample_pdf(ts_mid, weights_c[..., 1:-1],
                           settings.n_samples_fine)
        # NOTE: rank-merge beats sort standalone (3.6 vs 4.9 ms) but
        # LOSES in the fused pipeline (bench 515k vs 534k rays/s — the
        # one-hot intermediates break XLA's fusion here); keep the sort
        ts_f = jnp.sort(jnp.concatenate([ts, t_new], axis=-1), axis=-1)

        if fine_budget is not None:
            # grid= is safe here: this path's coarse grid is always the
            # unperturbed linspace (no key/harmony above)
            ts_f, deltas_f = select_sample_budget(
                ts_f, ts, sigma_c, fine_budget,
                grid=(settings.near, settings.far))
            n_eval = fine_budget
        else:
            deltas_f, n_eval = None, nf

        if coarse_share > 1:
            # the whole proposal chain (σ → weights → resample → select)
            # ran once per group; broadcast the shared depth set to every
            # ray in the group — the fine pass below still evaluates each
            # ray's OWN 3-D points at those depths
            def expand(x):
                k = x.shape[-1]
                return jnp.broadcast_to(
                    x[:, None, :], (rc, coarse_share, k)
                ).reshape(r, k)

            ts_f = expand(ts_f)
            if deltas_f is not None:
                deltas_f = expand(deltas_f)

        ptf, dtf = _points_t(rays_o, rays_d, ts_f)
        rgb_t, sigma_t = fused_nerf_apply_t(w1f, w2f, encf, ptf, dtf, **kw_f)
        rgb_f = rgb_t.reshape(3, r, n_eval).transpose(1, 2, 0)
        sigma_f = sigma_t.reshape(r, n_eval)
        comp_f = alpha_composite(rgb_f, sigma_f, ts_f,
                                 white_bkgd=settings.white_bkgd,
                                 deltas=deltas_f)

        out = {"rgb": comp_f.rgb, "t_exp": comp_f.t_exp,
               "acc": comp_f.acc}
        if coarse_rgb:
            out["rgb_coarse"] = comp_c.rgb
            out["t_exp_coarse"] = comp_c.t_exp
        return out

    return render


@dataclasses.dataclass
class FusedNerfRenderer:
    """Convenience wrapper holding packed kernel weights for coarse+fine.

    Build from trained flax params with :meth:`from_params`; call
    :meth:`render` on flat ray blocks.
    """

    packed_coarse: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    packed_fine: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    settings: RenderSettings
    tile: int = 4096
    interpret: bool = False
    depth: int = 8
    num_freq_coor: int = 10
    num_freq_dir: int = 4
    width: int = 256
    depth_fine: int = None
    width_fine: int = None
    coarse_rgb: bool = True
    fine_budget: int = None
    coarse_share: int = 1
    sigma_grid: "Optional[Tuple[jnp.ndarray, Any]]" = None  # (values, GridSpec)

    def __post_init__(self):
        self._fn = make_fused_render_fn(
            self.settings, self.tile, self.interpret, self.depth,
            self.num_freq_coor, self.num_freq_dir, self.width,
            self.depth_fine, self.width_fine, self.coarse_rgb,
            self.fine_budget, self.coarse_share,
            grid_spec=self.sigma_grid[1] if self.sigma_grid else None,
        )

    @classmethod
    def from_params(
        cls,
        params_coarse,
        params_fine,
        settings: RenderSettings,
        depth: int = 8,
        num_freq_coor: int = 10,
        num_freq_dir: int = 4,
        width: int = 256,
        tile: int = 4096,
        interpret: bool = False,
        depth_fine: int = None,
        width_fine: int = None,
        coarse_rgb: bool = True,
        fine_budget: int = None,
        coarse_share: int = 1,
        sigma_grid=None,
    ) -> "FusedNerfRenderer":
        pc = pack_nerf_params(params_coarse, depth=depth,
                              num_freq_coor=num_freq_coor,
                              num_freq_dir=num_freq_dir, width=width)
        pf = pack_nerf_params(params_fine, depth=depth_fine or depth,
                              num_freq_coor=num_freq_coor,
                              num_freq_dir=num_freq_dir,
                              width=width_fine or width)
        return cls(pc, pf, settings, tile=tile, interpret=interpret,
                   depth=depth, num_freq_coor=num_freq_coor,
                   num_freq_dir=num_freq_dir, width=width,
                   depth_fine=depth_fine, width_fine=width_fine,
                   coarse_rgb=coarse_rgb, fine_budget=fine_budget,
                   coarse_share=coarse_share, sigma_grid=sigma_grid)

    def render(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray
               ) -> Dict[str, jnp.ndarray]:
        if self.sigma_grid is not None:
            return self._fn(*self.packed_coarse, *self.packed_fine,
                            rays_o, rays_d, self.sigma_grid[0])
        return self._fn(*self.packed_coarse, *self.packed_fine, rays_o, rays_d)

    def render_image(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     block: int = 16384) -> Dict[str, jnp.ndarray]:
        """Arbitrary ray count by fixed blocks (pads the tail)."""
        n = rays_o.shape[0]
        outs = []
        for start in range(0, n, block):
            end = min(start + block, n)
            bo, bd = rays_o[start:end], rays_d[start:end]
            if end - start < block:
                pad = block - (end - start)
                bo = jnp.concatenate([bo, jnp.zeros((pad, 3), bo.dtype)], 0)
                bd = jnp.concatenate([bd, jnp.ones((pad, 3), bd.dtype)], 0)
            out = self.render(bo, bd)
            outs.append(jax.tree.map(lambda x: x[: end - start], out))
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)


def make_sharded_fused_render_fn(
    settings: RenderSettings,
    mesh,
    axis: str = "data",
    **kw,
):
    """Multi-chip fused render: shard the ray axis over ``mesh``'s data
    axis with ``shard_map`` — each chip runs the fused Pallas pipeline on
    its ray shard, weights replicated, no collectives in the hot path
    (output rows gather only at fetch). The multi-chip Phase-B/F analog of
    the reference's (absent) distributed rendering.

    Ray count must be divisible by mesh size × tile.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
        vma_kw = {"check_vma": False}
    except ImportError:  # pragma: no cover
        # experimental API (jax < 0.8) spells the same escape hatch
        # check_rep — passing check_vma there would TypeError
        from jax.experimental.shard_map import shard_map
        vma_kw = {"check_rep": False}

    inner = make_fused_render_fn(settings, **kw)
    n_w = 6  # packed coarse (3) + packed fine (3) weight operands

    in_specs = (P(),) * n_w + (P(axis), P(axis))
    if kw.get("grid_spec") is not None:
        in_specs += (P(),)  # density grid: replicated on every chip
    out_specs = {"rgb": P(axis), "t_exp": P(axis), "acc": P(axis)}
    if kw.get("coarse_rgb", True):
        out_specs["rgb_coarse"] = P(axis)
        out_specs["t_exp_coarse"] = P(axis)
    return jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            **vma_kw,
        )
    )
