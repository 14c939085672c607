"""Density-grid proposal (render.grid + render.fast grid_spec): skip the
coarse MLP by gathering σ from a voxel snapshot of the frozen fine density.

The reference evaluates a full coarse NeRF on 64 uniform samples of every
ray of every frame (/root/reference/rendering.py:27-36, utils.py:509-531);
after Phase A the density never changes, so that work is a constant being
recomputed. These tests pin the sampler's math, the builder's consistency
with the trunk kernel, and the end-to-end quality claim on a trained scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.render.grid import (
    GridSpec,
    build_sigma_grid,
    load_sigma_grid,
    ray_bounds,
    sample_sigma_grid,
    save_sigma_grid,
)

SPEC = GridSpec(lo=(-1.0, -1.0, 0.0), hi=(1.0, 1.0, 1.0))


def _lattice(spec, res):
    axes = [np.linspace(spec.lo[i], spec.hi[i], res[i], dtype=np.float32)
            for i in range(3)]
    return np.stack(np.meshgrid(*axes, indexing="ij"), -1)


class TestSampler:
    def test_exact_at_lattice_points(self):
        rng = np.random.default_rng(0)
        vals = jnp.asarray(rng.normal(size=(5, 6, 7)).astype(np.float32))
        pts = jnp.asarray(_lattice(SPEC, (5, 6, 7)).reshape(-1, 3))
        for interp in ("trilinear", "nearest"):
            got = sample_sigma_grid(
                vals, GridSpec(SPEC.lo, SPEC.hi, interp), pts)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(vals).reshape(-1),
                                       rtol=1e-5, atol=1e-5)

    def test_trilinear_midpoint_is_corner_mean(self):
        vals = jnp.asarray(
            np.random.default_rng(1).normal(size=(3, 3, 3)).astype(np.float32))
        lat = _lattice(SPEC, (3, 3, 3))
        mid = jnp.asarray((lat[0, 0, 0] + lat[1, 1, 1]) / 2.0)[None]
        got = float(sample_sigma_grid(vals, SPEC, mid)[0])
        want = float(np.mean(np.asarray(vals)[:2, :2, :2]))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_out_of_bounds_clamps_to_border(self):
        vals = jnp.asarray(
            np.arange(27, dtype=np.float32).reshape(3, 3, 3))
        far_out = jnp.asarray([[9.0, 9.0, 9.0], [-9.0, -9.0, -9.0]])
        got = np.asarray(sample_sigma_grid(vals, SPEC, far_out))
        np.testing.assert_allclose(got, [26.0, 0.0], rtol=1e-5)

    def test_linear_field_reproduced_exactly(self):
        """A trilinear sampler must represent a linear function exactly
        at ANY point — the strongest interpolation identity."""
        lat = _lattice(SPEC, (4, 5, 6))
        w = np.asarray([0.3, -1.2, 2.0], np.float32)
        vals = jnp.asarray((lat @ w).astype(np.float32))
        rng = np.random.default_rng(2)
        pts = jnp.asarray(
            rng.uniform(-0.99, 0.99, (64, 3)).astype(np.float32)
            * np.asarray([1, 1, 0.5], np.float32)
            + np.asarray([0, 0, 0.5], np.float32))
        got = np.asarray(sample_sigma_grid(vals, SPEC, pts))
        np.testing.assert_allclose(got, np.asarray(pts) @ w,
                                   rtol=1e-4, atol=1e-4)

    def test_bad_spec_rejected(self):
        with pytest.raises(ValueError):
            GridSpec(lo=(0, 0, 0), hi=(1, 1, 1), interp="cubic")
        with pytest.raises(ValueError):
            GridSpec(lo=(0, 0, 0), hi=(1, 1, 0))


class TestRayBounds:
    def test_covers_all_sample_points(self):
        rng = np.random.default_rng(3)
        ro = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
        rd = rng.normal(size=(100, 3)).astype(np.float32)
        lo, hi = ray_bounds(ro, rd, 0.1, 1.0)
        for t in np.linspace(0.1, 1.0, 7):
            p = ro + t * rd
            assert (p >= np.asarray(lo)).all() and (p <= np.asarray(hi)).all()


class TestBuilder:
    def _packed(self):
        from tgtc.models.nerf import NerfConfig
        from tgtc.ops.pallas.nerf_mlp import pack_nerf_params
        from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

        cfg = NerfConfig(depth=2, width=32, embed_freq_coor=4,
                         embed_freq_dir=2, compute_dtype=jnp.float32)
        _, _, state = init_state(jax.random.PRNGKey(0), cfg,
                                 NerfTrainConfig())
        pkw = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=32)
        return pack_nerf_params(state.params_fine, **pkw), pkw

    def test_grid_upper_bounds_center_sigma(self, tmp_path):
        """The builder max-pools σ over half-cell corner offsets, so every
        voxel value must be >= the trunk's σ at the voxel center — the
        conservative-proposal property — and the npz roundtrip is exact."""
        from tgtc.ops.pallas.nerf_mlp import fused_nerf_sigma_apply_t

        packed, pkw = self._packed()
        res = (4, 4, 4)
        vals = build_sigma_grid(
            packed, SPEC, res, depth=2, num_freq_coor=4, width=32,
            tile=64, interpret=True, chunk=64,
        )
        assert vals.shape == res
        lat = jnp.asarray(_lattice(SPEC, res).reshape(-1, 3))
        direct = fused_nerf_sigma_apply_t(
            *packed, lat.T, depth=2, num_freq_coor=4, width=32,
            tile=64, interpret=True).reshape(-1)
        assert np.all(np.asarray(vals).reshape(-1)
                      >= np.asarray(direct) - 1e-5)

        p = str(tmp_path / "grid.npz")
        save_sigma_grid(p, vals, SPEC)
        vals2, spec2 = load_sigma_grid(p)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals2))
        assert spec2 == SPEC


class TestGridRender:
    def _renderer(self, state, sigma_grid, **kw):
        from tgtc.render.fast import FusedNerfRenderer
        from tgtc.render.volume import RenderSettings

        settings = RenderSettings(n_samples=8, n_samples_fine=8,
                                  sigma_noise_std=0.0)
        return FusedNerfRenderer.from_params(
            state.params_coarse, state.params_fine, settings,
            depth=2, num_freq_coor=4, num_freq_dir=2, width=32,
            tile=128, interpret=True, coarse_rgb=False,
            sigma_grid=sigma_grid, **kw,
        )

    def _state_and_grid(self, trained_steps=0):
        from tests.test_train_nerf import TINY_NERF, TINY_TRAIN, _toy_rays
        from tgtc.ops.pallas.nerf_mlp import pack_nerf_params
        from tgtc.train.nerf_trainer import init_state, make_train_step

        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF,
                                   TINY_TRAIN)
        ro, rd, rgb = _toy_rays(n=512)
        if trained_steps:
            step = make_train_step(cm, fm, TINY_TRAIN)
            k = jax.random.PRNGKey(2)
            for _ in range(trained_steps):
                state, m = step(state, ro, rd, rgb, k)
        lo, hi = ray_bounds(np.asarray(ro), np.asarray(rd), 0.0, 1.0)
        spec = GridSpec(lo=lo, hi=hi)
        packed = pack_nerf_params(state.params_fine, depth=2,
                                  num_freq_coor=4, num_freq_dir=2, width=32)
        vals = build_sigma_grid(packed, spec, (24, 24, 24), depth=2,
                                num_freq_coor=4, width=32, tile=128,
                                interpret=True, chunk=1024)
        return state, (vals, spec), ro, rd

    def test_runs_and_composes_with_budget_and_share(self):
        state, grid, ro, rd = self._state_and_grid()
        out = self._renderer(state, grid).render(ro[:128], rd[:128])
        assert out["rgb"].shape == (128, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()
        out2 = self._renderer(state, grid, fine_budget=12,
                              coarse_share=2).render(ro[:128], rd[:128])
        assert np.isfinite(np.asarray(out2["rgb"])).all()

    def test_requires_sigma_only(self):
        from tgtc.render.fast import make_fused_render_fn
        from tgtc.render.volume import RenderSettings

        with pytest.raises(ValueError, match="coarse_rgb=False"):
            make_fused_render_fn(
                RenderSettings(n_samples=8, n_samples_fine=8),
                coarse_rgb=True, grid_spec=SPEC,
            )

    def test_sharded_equals_single_device(self, cpu_mesh8):
        """Grid proposal under shard_map (replicated grid operand,
        sharded rays): 8-way equals single-device."""
        from tgtc.render.fast import (
            make_fused_render_fn, make_sharded_fused_render_fn,
        )
        from tgtc.render.volume import RenderSettings

        state, (vals, spec), ro, rd = self._state_and_grid()
        settings = RenderSettings(n_samples=8, n_samples_fine=8,
                                  sigma_noise_std=0.0)
        from tgtc.ops.pallas.nerf_mlp import pack_nerf_params

        pkw = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=32)
        pc = pack_nerf_params(state.params_coarse, **pkw)
        pf = pack_nerf_params(state.params_fine, **pkw)
        kw = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=32,
                  tile=16, interpret=True, coarse_rgb=False,
                  grid_spec=spec, fine_budget=12, coarse_share=2)
        single = make_fused_render_fn(settings, **kw)(
            *pc, *pf, ro[:256], rd[:256], vals)
        sharded = make_sharded_fused_render_fn(settings, cpu_mesh8, **kw)(
            *pc, *pf, ro[:256], rd[:256], vals)
        for k in single:
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]),
                atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_trained_scene_grid_matches_exact(self):
        """On an overfit toy field the grid-proposed render must agree
        with the exact coarse-MLP render to high PSNR: the proposal only
        steers fine sampling, and a 24^3 snapshot of THE SAME density
        resolves this field."""
        state, grid, ro, rd = self._state_and_grid(trained_steps=200)
        exact = self._renderer(state, None).render(ro[:256], rd[:256])
        gridded = self._renderer(state, grid).render(ro[:256], rd[:256])
        a = np.clip(np.asarray(exact["rgb"]), 0, 1)
        b = np.clip(np.asarray(gridded["rgb"]), 0, 1)
        agree = -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)
        assert agree > 30.0, f"grid render diverges: {agree:.1f} dB"
