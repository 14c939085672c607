"""Separate fine-network dims: the reference sizes the fine net via
``netdepth_fine``/``netwidth_fine`` (/root/reference/models.py:202-205);
coarse and fine must NOT be forced to share dims."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgtc.models.nerf import NerfConfig
from tgtc.train.nerf_trainer import (
    NerfTrainConfig, init_state, make_render_fn, make_train_step,
    render_image,
)

COARSE = NerfConfig(depth=2, width=16, embed_freq_coor=2, embed_freq_dir=1,
                    use_viewdir=True)
FINE = NerfConfig(depth=3, width=32, embed_freq_coor=2, embed_freq_dir=1,
                  use_viewdir=True)
TRAIN = NerfTrainConfig(batch_size=64, n_samples=4, n_samples_fine=4,
                        sigma_noise_std=0.0)


def _rays(n=256):
    key = jax.random.PRNGKey(0)
    ro = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
    rd = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rgb = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return ro, rd, rgb


class TestAsymmetricDims:
    def test_init_state_builds_distinct_nets(self):
        cm, fm, state = init_state(jax.random.PRNGKey(0), COARSE, TRAIN,
                                   fine_cfg=FINE)
        wc = state.params_coarse["params"]["base_0"]["kernel"]
        wf = state.params_fine["params"]["base_0"]["kernel"]
        assert wc.shape[1] == 16 and wf.shape[1] == 32
        layers = [k for k in state.params_fine["params"]
                  if k.startswith("base_") and k != "base_remap"]
        assert len(layers) == 3

    @pytest.mark.slow
    def test_train_step_and_render(self):
        cm, fm, state = init_state(jax.random.PRNGKey(0), COARSE, TRAIN,
                                   fine_cfg=FINE)
        step_fn = make_train_step(cm, fm, TRAIN)
        ro, rd, rgb = _rays()
        state, metrics = step_fn(state, ro, rd, rgb, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        render_fn = make_render_fn(cm, fm, TRAIN)
        out = render_image(render_fn, state.params_coarse, state.params_fine,
                           ro, rd, block=128)
        assert out["rgb"].shape == (256, 3)
        assert np.isfinite(np.asarray(out["rgb"])).all()

    def test_fused_renderer_asymmetric(self):
        """FusedNerfRenderer (interpret mode) must match the XLA path when
        coarse and fine dims differ."""
        from tgtc.render.fast import FusedNerfRenderer

        cm, fm, state = init_state(jax.random.PRNGKey(0), COARSE, TRAIN,
                                   fine_cfg=FINE)
        settings = TRAIN.render_settings(perturb=False)
        rend = FusedNerfRenderer.from_params(
            state.params_coarse, state.params_fine, settings,
            depth=2, width=16, depth_fine=3, width_fine=32,
            num_freq_coor=2, num_freq_dir=1, tile=128, interpret=True,
        )
        ro, rd, _ = _rays(128)
        out = rend.render(ro, rd)
        render_fn = make_render_fn(cm, fm, TRAIN)
        ref = render_image(render_fn, state.params_coarse, state.params_fine,
                           ro, rd, block=128)
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
            rtol=2e-2, atol=2e-2,  # kernel runs bf16
        )

    def test_torch_fine_checkpoint_asymmetric(self, tmp_path):
        """A reference .tar whose fine net has different dims converts and
        applies."""
        torch = pytest.importorskip("torch")
        from tgtc.models.torch_compat import load_reference_nerf_checkpoint

        def mk_sd(depth, width, in_ch=15, in_dir=9):
            sd, dim = {}, in_ch
            for i in range(depth):
                d_in = dim if i != 1 else width + in_ch  # skip at 1 for tiny
                sd[f"base_layers.{i}.weight"] = torch.randn(width, d_in)
                sd[f"base_layers.{i}.bias"] = torch.randn(width)
                dim = width
            sd["sigma_layer.weight"] = torch.randn(1, width)
            sd["sigma_layer.bias"] = torch.randn(1)
            sd["base_remap_layer.weight"] = torch.randn(width, width)
            sd["base_remap_layer.bias"] = torch.randn(width)
            sd["rgb_layers.0.weight"] = torch.randn(width // 2,
                                                    width + in_dir)
            sd["rgb_layers.0.bias"] = torch.randn(width // 2)
            sd["rgb_layers.1.weight"] = torch.randn(3, width // 2)
            sd["rgb_layers.1.bias"] = torch.randn(3)
            return sd

        path = tmp_path / "000010.tar"
        torch.save({"global_step": 10, "model": mk_sd(2, 16),
                    "model_fine": mk_sd(3, 32)}, path)
        step, coarse, fine = load_reference_nerf_checkpoint(
            str(path), depth=2, depth_fine=3)
        assert step == 10
        assert coarse["params"]["base_0"]["kernel"].shape[1] == 16
        assert fine["params"]["base_0"]["kernel"].shape[1] == 32
        assert "base_2" in fine["params"]


class TestPipelineFineDims:
    @pytest.mark.slow
    def test_pipeline_builds_fine_cfg(self, synthetic_llff_dir, tmp_path):
        from tgtc.config import Config
        from tgtc.train.pipeline import Pipeline

        cfg = Config(
            expname="finedims", basedir=str(tmp_path / "logs"),
            datadir=synthetic_llff_dir, styledir=str(tmp_path),
            factor=1.0, netdepth=2, netwidth=16,
            netdepth_fine=3, netwidth_fine=32,
            embed_freq_coor=2, embed_freq_dir=1,
            N_samples=4, N_samples_fine=4, batch_size=64,
            origin_step=3, i_print=100, sigma_noise_std=0.0,
            use_pallas=False,
        )
        pipe = Pipeline(cfg)
        assert pipe.nerf_cfg_fine.depth == 3
        assert pipe.nerf_cfg_fine.width == 32
        pipe.train_nerf()
        cm, fm, state, _ = pipe._nerf_setup()
        assert state.params_fine["params"]["base_0"]["kernel"].shape[1] == 32
        psnr = pipe.evaluate()
        assert np.isfinite(psnr)
        pipe.close()
