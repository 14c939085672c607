"""Fused NeRF-MLP Pallas kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles to Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig, make_nerf, nerf_apply
from tgtc.ops.pallas.nerf_mlp import (
    _encoding_matrices,
    fused_nerf_apply,
    pack_nerf_params,
)
from tgtc.ops.encoding import positional_encoding


class TestEncodingMatrices:
    def test_matmul_sin_equals_reference_encoding(self):
        """sin(Pmat @ x + phase) must reproduce positional_encoding's
        sin/cos block exactly (f32)."""
        pmat, phase = _encoding_matrices(4)
        x = np.random.default_rng(0).normal(size=(3, 7)).astype(np.float32)
        got = np.sin(pmat @ x + phase)  # [24, 7]
        ref = np.asarray(positional_encoding(jnp.asarray(x.T), 4))[:, 3:]  # drop raw
        np.testing.assert_allclose(got.T, ref, atol=1e-5)


class TestFusedKernel:
    @pytest.mark.parametrize("n_points", [256, 300])  # aligned + padded tail
    def test_matches_xla_path(self, n_points):
        cfg = NerfConfig()  # full-size trunk
        model, params = make_nerf(cfg, jax.random.PRNGKey(0))
        packed = pack_nerf_params(params)
        key = jax.random.PRNGKey(1)
        pts = jax.random.uniform(key, (n_points, 3), minval=-1, maxval=1)
        dirs = jax.random.normal(key, (n_points, 3))

        out = fused_nerf_apply(packed, pts, dirs, tile=128, interpret=True)
        ref = nerf_apply(model, params, pts, dirs)
        # bf16 compute → loose tolerances
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(out["sigma"]), np.asarray(ref["sigma"]), atol=2e-1
        )

    @pytest.mark.parametrize("depth,width,fc,fd,skip",
                             [(4, 128, 6, 2, 2), (6, 64, 8, 3, 4)])
    @pytest.mark.slow
    def test_non_default_architectures(self, depth, width, fc, fd, skip):
        """Packing must not assume the default 8x256/freq-10 shape
        (regression: width was hardcoded once)."""
        cfg = NerfConfig(depth=depth, width=width, embed_freq_coor=fc,
                         embed_freq_dir=fd, skips=(skip,))
        model, params = make_nerf(cfg, jax.random.PRNGKey(0))
        packed = pack_nerf_params(params, depth=depth, num_freq_coor=fc,
                                  num_freq_dir=fd, width=width, skip=skip)
        key = jax.random.PRNGKey(1)
        pts = jax.random.uniform(key, (128, 3), minval=-1, maxval=1)
        dirs = jax.random.normal(key, (128, 3))
        out = fused_nerf_apply(packed, pts, dirs, tile=128, interpret=True,
                               depth=depth, num_freq_coor=fc, num_freq_dir=fd,
                               width=width, skip=skip)
        ref = nerf_apply(model, params, pts, dirs)
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(out["sigma"]), np.asarray(ref["sigma"]), atol=2e-1
        )

    def test_fused_render_pipeline_matches_xla(self):
        """Full coarse→fine fused pipeline vs the XLA render path."""
        from tgtc.render.fast import FusedNerfRenderer
        from tgtc.render.volume import RenderSettings
        from tgtc.train.nerf_trainer import (
            NerfTrainConfig, init_state, make_render_fn,
        )

        cm, fm, state = init_state(
            jax.random.PRNGKey(0), NerfConfig(), NerfTrainConfig()
        )
        settings = RenderSettings(n_samples=8, n_samples_fine=8,
                                  sigma_noise_std=0.0)
        rend = FusedNerfRenderer.from_params(
            state.params_coarse, state.params_fine, settings,
            tile=128, interpret=True,
        )
        key = jax.random.PRNGKey(1)
        ro = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
        rd = jax.random.normal(key, (64, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

        out = rend.render(ro, rd)
        xla_fn = make_render_fn(
            cm, fm, NerfTrainConfig(n_samples=8, n_samples_fine=8,
                                    sigma_noise_std=0.0)
        )
        ref = xla_fn(state.params_coarse, state.params_fine, ro, rd)
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(out["t_exp"]), np.asarray(ref["t_exp"]), atol=5e-2
        )


    def test_sigma_only_coarse_identical_fine(self):
        """coarse_rgb=False (sigma-only trunk kernel on the coarse pass)
        gives the bitwise-identical fine image: identical sigma → identical
        weights → identical sample_pdf → identical fine pass."""
        from tgtc.render.fast import FusedNerfRenderer
        from tgtc.render.volume import RenderSettings
        from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

        _, _, state = init_state(
            jax.random.PRNGKey(0), NerfConfig(), NerfTrainConfig()
        )
        settings = RenderSettings(n_samples=8, n_samples_fine=8,
                                  sigma_noise_std=0.0)
        mk = lambda cr: FusedNerfRenderer.from_params(
            state.params_coarse, state.params_fine, settings,
            tile=128, interpret=True, coarse_rgb=cr,
        )
        key = jax.random.PRNGKey(1)
        ro = jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
        rd = jax.random.normal(key, (64, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        out_full = mk(True).render(ro, rd)
        out_sig = mk(False).render(ro, rd)
        assert "rgb_coarse" not in out_sig
        np.testing.assert_array_equal(np.asarray(out_full["rgb"]),
                                      np.asarray(out_sig["rgb"]))
        np.testing.assert_array_equal(np.asarray(out_full["t_exp"]),
                                      np.asarray(out_sig["t_exp"]))


class TestShardedFusedRender:
    def test_sharded_matches_single_device(self, cpu_mesh8):
        """The fused render under shard_map over 8 virtual devices equals
        the unsharded result (interpret mode on CPU)."""
        from tgtc.models.nerf import NerfConfig
        from tgtc.render.fast import (
            make_fused_render_fn,
            make_sharded_fused_render_fn,
        )
        from tgtc.render.volume import RenderSettings
        from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

        cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                         embed_freq_dir=1, use_viewdir=True)
        cm, fm, state = init_state(jax.random.PRNGKey(0), cfg,
                                   NerfTrainConfig())
        from tgtc.ops.pallas.nerf_mlp import pack_nerf_params

        kw = dict(depth=2, num_freq_coor=2, num_freq_dir=1, width=16,
                  tile=16, interpret=True)
        pc = pack_nerf_params(state.params_coarse, depth=2, num_freq_coor=2,
                              num_freq_dir=1, width=16)
        pf = pack_nerf_params(state.params_fine, depth=2, num_freq_coor=2,
                              num_freq_dir=1, width=16)
        settings = RenderSettings(n_samples=4, n_samples_fine=4,
                                  sigma_noise_std=0.0)

        key = jax.random.PRNGKey(1)
        n = 8 * 16 * 2  # mesh size x tile x 2
        ro = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
        rd = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

        single = make_fused_render_fn(settings, **kw)(*pc, *pf, ro, rd)
        sharded_fn = make_sharded_fused_render_fn(settings, cpu_mesh8, **kw)
        sharded = sharded_fn(*pc, *pf, ro, rd)
        np.testing.assert_allclose(
            np.asarray(sharded["rgb"]), np.asarray(single["rgb"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sharded["t_exp"]), np.asarray(single["t_exp"]),
            rtol=1e-5, atol=1e-6,
        )
