"""Reference-experiment import: newest NeRF/style/latent ``.tar`` files
convert into tgtc orbax checkpoints that the Pipeline resumes from
(tgtc.tools.import_reference)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tgtc.config import Config
from tgtc.train.pipeline import Pipeline


def _torch_dense(flax_leaf):
    """flax {kernel [in,out], bias [out]} → torch (weight [out,in], bias)."""
    w = torch.from_numpy(np.asarray(flax_leaf["kernel"]).T.copy())
    b = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())
    return w, b


def _nerf_sd(params, depth):
    """tgtc NerfMLP params → reference MLP_style state dict layout
    (shape-mirrored so conversion round-trips exactly)."""
    p = params["params"]
    sd = {}
    for i in range(depth):
        w, b = _torch_dense(p[f"base_{i}"])
        sd[f"base_layers.{i}.weight"], sd[f"base_layers.{i}.bias"] = w, b
    for ours, theirs in (("sigma", "sigma_layer"),
                         ("base_remap", "base_remap_layer")):
        w, b = _torch_dense(p[ours])
        sd[f"{theirs}.weight"], sd[f"{theirs}.bias"] = w, b
    for i in range(2):
        w, b = _torch_dense(p[f"rgb_{i}"])
        sd[f"rgb_layers.{i}.weight"], sd[f"rgb_layers.{i}.bias"] = w, b
    return sd


def _style_sds(concat_params, style_params):
    concat_sd = {}
    cp = concat_params["params"]
    for i, name in enumerate(sorted(cp, key=lambda n: int(n.split("_")[1]))):
        w, b = _torch_dense(cp[name])
        concat_sd[f"layers.{i}.weight"], concat_sd[f"layers.{i}.bias"] = w, b
    sp = style_params["params"]
    names = sorted([n for n in sp if n != "rgb_out"],
                   key=lambda n: int(n.split("_")[1]))
    style_sd = {}
    for i, name in enumerate(names):
        w, b = _torch_dense(sp[name])
        style_sd[f"layers.{i}.weight"], style_sd[f"layers.{i}.bias"] = w, b
    w, b = _torch_dense(sp["rgb_out"])
    style_sd[f"layers.{len(names)}.weight"] = w
    style_sd[f"layers.{len(names)}.bias"] = b
    return concat_sd, style_sd


def test_import_then_pipeline_resumes(synthetic_llff_dir, tmp_path):
    from tgtc.models.nerf import NerfConfig
    from tgtc.models.style_field import StyleFieldConfig
    from tgtc.tools.import_reference import import_reference_checkpoints
    from tgtc.train.nerf_trainer import NerfTrainConfig, init_state
    from tgtc.train.style3d import StyleTrainConfig, init_style_state

    cfg = Config(
        expname="imp", basedir=str(tmp_path / "logs"),
        datadir=synthetic_llff_dir, styledir=str(tmp_path), factor=1.0,
        netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
        embed_freq_coor=2, embed_freq_dir=1, use_viewdir=True,
        N_samples=4, N_samples_fine=4, batch_size=64, batch_size_style=32,
        origin_step=100, style_D=4, vae_latent=8,
        sigma_noise_std=0.0, use_pallas=False,
    )
    nerf_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                          embed_freq_dir=1, use_viewdir=True)
    # source-of-truth params (play the role of trained reference weights)
    _, _, src = init_state(jax.random.PRNGKey(42), nerf_cfg,
                           NerfTrainConfig(batch_size=64))
    field = StyleFieldConfig(style_d=4, width=16, latent_dim=8,
                             embed_dim=nerf_cfg.input_ch)
    _, _, s_src = init_style_state(
        jax.random.PRNGKey(43), field,
        StyleTrainConfig(batch_size=32), style_num=2, frame_num=3,
    )

    ref_dir = tmp_path / "ref_logs"
    ref_dir.mkdir()
    torch.save(
        {"global_step": 77, "model": _nerf_sd(src.params_coarse, 2),
         "model_fine": _nerf_sd(src.params_fine, 2)},
        ref_dir / "000077.tar",
    )
    concat_sd, style_sd = _style_sds(
        {"params": s_src.params["concat"]["params"]},
        {"params": s_src.params["style"]["params"]},
    )
    torch.save({"model": style_sd, "concat_model": concat_sd},
               ref_dir / "style_000123.tar")
    torch.save(
        {"train_set_1": {
            "latents": torch.from_numpy(
                np.asarray(s_src.params["latents"]).copy()),
            "style_latents_mu": torch.from_numpy(np.asarray(s_src.mu).copy()),
            "style_latents_logvar": torch.from_numpy(
                np.asarray(s_src.logvar).copy()),
        }},
        ref_dir / "latent_000123.tar",
    )

    out = import_reference_checkpoints(cfg, str(ref_dir))
    assert out == {"nerf_step": 77, "style_step": 123}

    # the pipeline resumes from the imported checkpoints
    pipe = Pipeline(cfg)
    cm, fm, state, _ = pipe._nerf_setup()
    assert int(state.step) == 77
    np.testing.assert_allclose(
        np.asarray(state.params_coarse["params"]["base_0"]["kernel"]),
        np.asarray(src.params_coarse["params"]["base_0"]["kernel"]),
        rtol=1e-6,
    )
    assert pipe.style_ckpt.latest_step() == 123
    _, _, st = init_style_state(
        jax.random.PRNGKey(0), field, StyleTrainConfig(batch_size=32),
        style_num=2, frame_num=3,
    )
    st = pipe.style_ckpt.restore(st)
    np.testing.assert_allclose(
        np.asarray(st.params["latents"]),
        np.asarray(s_src.params["latents"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(st.params["style"]["params"]["rgb_out"]["kernel"]),
        np.asarray(s_src.params["style"]["params"]["rgb_out"]["kernel"]),
        rtol=1e-6,
    )
    pipe.close()
