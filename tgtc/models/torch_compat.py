"""Torch → flax checkpoint converters for the reference's pretrained assets.

The reference ships/produces torch state dicts (``vgg_normalised.pth``,
``decoder.pth``, ``transformer_iter_*.pth``, ``embedding_iter_*.pth``,
``vae.pth``, NeRF/style ``*.tar`` — /root/reference/config.py:22-24,
/root/reference/train_tgtcs.py:284-305). These converters map them onto the
flax module layouts in tgtc.models so published weights load directly
(SURVEY.md §7 "weight-compatibility" hard part).

Conventions: torch ``Linear.weight [out, in]`` → flax ``kernel [in, out]``
(transpose); ``Conv2d OIHW`` → ``HWIO``; ``LayerNorm.weight/bias`` →
``scale/bias``; torch ``nn.MultiheadAttention.in_proj_weight`` splits into
q/k/v projections. All functions accept numpy arrays or torch tensors.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(w, b=None) -> Dict[str, jnp.ndarray]:
    out = {"kernel": jnp.asarray(_np(w).T)}
    if b is not None:
        out["bias"] = jnp.asarray(_np(b))
    return out


def _layernorm(w, b) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(w)), "bias": jnp.asarray(_np(b))}


def _mha(prefix: str, sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → tgtc MultiHeadAttention params."""
    inw = _np(sd[f"{prefix}.in_proj_weight"])
    inb = _np(sd[f"{prefix}.in_proj_bias"])
    d = inw.shape[1]
    return {
        "q_proj": _dense(inw[:d], inb[:d]),
        "k_proj": _dense(inw[d : 2 * d], inb[d : 2 * d]),
        "v_proj": _dense(inw[2 * d :], inb[2 * d :]),
        "out_proj": _dense(
            sd[f"{prefix}.out_proj.weight"], sd[f"{prefix}.out_proj.bias"]
        ),
    }


def convert_torch_transformer(
    sd: Dict[str, Any], num_encoder_layers: int = 3,
    num_decoder_layers: int = 3,
) -> Dict[str, Any]:
    """Reference ``Transformer`` state dict
    (/root/reference/transformer.py:13-44) → tgtc StyleTransformer params.

    Every encoder layer carries BOTH fused projections: ``pos`` selects the
    branch per call (/root/reference/transformer.py:172-177) and the three
    StyTrans invocations (Ics/Icc/Iss, /root/reference/tctrans.py:204-220)
    between them exercise both branches on both encoders. The dead
    ``new_ps`` conv is dropped.
    """
    params: Dict[str, Any] = {}
    for i in range(num_encoder_layers):
        for ours, theirs in (
            (f"enc_s_{i}", f"encoder_s.layers.{i}"),
            (f"enc_c_{i}", f"encoder_c.layers.{i}"),
        ):
            params[ours] = {
                "qkv": _dense(sd[f"{theirs}.qkv.weight"]),
                "qk": _dense(sd[f"{theirs}.qk.weight"]),
                "self_attn": _mha(f"{theirs}.self_attn", sd),
                "linear1": _dense(sd[f"{theirs}.linear1.weight"],
                                  sd[f"{theirs}.linear1.bias"]),
                "linear2": _dense(sd[f"{theirs}.linear2.weight"],
                                  sd[f"{theirs}.linear2.bias"]),
                "norm1": _layernorm(sd[f"{theirs}.norm1.weight"],
                                    sd[f"{theirs}.norm1.bias"]),
                "norm2": _layernorm(sd[f"{theirs}.norm2.weight"],
                                    sd[f"{theirs}.norm2.bias"]),
            }
    for i in range(num_decoder_layers):
        theirs = f"decoder.layers.{i}"
        params[f"dec_{i}"] = {
            "self_attn": _mha(f"{theirs}.self_attn", sd),
            "cross_attn": _mha(f"{theirs}.multihead_attn", sd),
            "linear1": _dense(sd[f"{theirs}.linear1.weight"],
                              sd[f"{theirs}.linear1.bias"]),
            "linear2": _dense(sd[f"{theirs}.linear2.weight"],
                              sd[f"{theirs}.linear2.bias"]),
            "norm1": _layernorm(sd[f"{theirs}.norm1.weight"],
                                sd[f"{theirs}.norm1.bias"]),
            "norm2": _layernorm(sd[f"{theirs}.norm2.weight"],
                                sd[f"{theirs}.norm2.bias"]),
            "norm3": _layernorm(sd[f"{theirs}.norm3.weight"],
                                sd[f"{theirs}.norm3.bias"]),
        }
    params["dec_norm"] = _layernorm(sd["decoder.norm.weight"],
                                    sd["decoder.norm.bias"])
    return {"params": params}


def convert_torch_patch_embed(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``PatchEmbed`` (/root/reference/tctrans.py:13-33)."""
    w = _np(sd["proj.weight"])  # OIHW
    return {
        "params": {
            "proj": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(_np(sd["proj.bias"])),
            }
        }
    }


def convert_torch_vae(sd: Dict[str, Any], depth: int = 4) -> Dict[str, Any]:
    """Reference ``VAE`` (/root/reference/models.py:371-473)."""
    enc: Dict[str, Any] = {}
    for i in range(depth - 1):
        enc[f"fc_{i}"] = _dense(sd[f"encoder.fc_layers.{i}.weight"],
                                sd[f"encoder.fc_layers.{i}.bias"])
    enc["mu"] = _dense(sd["encoder.fc_layer_mu.weight"],
                       sd["encoder.fc_layer_mu.bias"])
    enc["logvar"] = _dense(sd["encoder.fc_layer_log_var.weight"],
                           sd["encoder.fc_layer_log_var.bias"])
    dec: Dict[str, Any] = {}
    for i in range(depth - 1):
        dec[f"fc_{i}"] = _dense(sd[f"decoder.fc_layers.{i}.weight"],
                                sd[f"decoder.fc_layers.{i}.bias"])
    dec["out"] = _dense(sd["decoder.output_layer.weight"],
                        sd["decoder.output_layer.bias"])
    return {"params": {"encoder": enc, "decoder": dec}}


def convert_torch_nerf(sd: Dict[str, Any], depth: int = 8) -> Dict[str, Any]:
    """Reference ``StyleNerf``/``MLP_style`` state dict
    (/root/reference/models.py:63-117) → tgtc NerfMLP params. Accepts keys
    with or without the ``net.`` prefix."""
    def get(k):
        return sd[f"net.{k}"] if f"net.{k}" in sd else sd[k]

    p: Dict[str, Any] = {}
    for i in range(depth):
        p[f"base_{i}"] = _dense(get(f"base_layers.{i}.weight"),
                                get(f"base_layers.{i}.bias"))
    p["sigma"] = _dense(get("sigma_layer.weight"), get("sigma_layer.bias"))
    p["base_remap"] = _dense(get("base_remap_layer.weight"),
                             get("base_remap_layer.bias"))
    p["rgb_0"] = _dense(get("rgb_layers.0.weight"), get("rgb_layers.0.bias"))
    p["rgb_1"] = _dense(get("rgb_layers.1.weight"), get("rgb_layers.1.bias"))
    return {"params": p}


def load_reference_nerf_checkpoint(path: str, depth: int = 8,
                                   depth_fine: int = None):
    """Load a reference NeRF ``%06d.tar`` (torch.save dict with keys
    ``global_step``, ``model``, ``model_fine`` —
    /root/reference/train_tgtcs.py:286-296) → (step, params_coarse,
    params_fine) in tgtc layout. ``depth_fine`` defaults to ``depth``
    (the reference sizes the fine net via netdepth_fine,
    /root/reference/models.py:202-205)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    step = int(ckpt.get("global_step", 0))
    coarse = convert_torch_nerf(ckpt["model"], depth=depth)
    fine = (
        convert_torch_nerf(ckpt["model_fine"], depth=depth_fine or depth)
        if "model_fine" in ckpt else None
    )
    return step, coarse, fine


def load_reference_style_checkpoint(path: str):
    """Load a reference ``style_%06d.tar`` (keys ``model`` = style MLP,
    ``concat_model`` — /root/reference/train_tgtcs.py:503-560) →
    {"concat": ..., "style": ...} flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_style_mlps(ckpt["concat_model"], ckpt["model"])


def load_reference_latent_checkpoint(path: str):
    """Load a reference ``latent_%06d.tar`` (key ``train_set_1`` =
    StyleLatents_variational state dict —
    /root/reference/train_tgtcs.py:143-146) → latent-state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["train_set_1"] if "train_set_1" in ckpt else ckpt
    return {
        "latents": jnp.asarray(_np(sd["latents"])),
        "mu": jnp.asarray(_np(sd["style_latents_mu"])),
        "logvar": jnp.asarray(_np(sd["style_latents_logvar"])),
    }


def convert_torch_style_mlps(
    concat_sd: Dict[str, Any], style_sd: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference ``StyleMLP_before_concat`` / ``StyleMLP_Wild_multilayers``
    (/root/reference/models.py:120-180)."""
    concat = {
        f"layer_{i}": _dense(concat_sd[f"layers.{i}.weight"],
                             concat_sd[f"layers.{i}.bias"])
        for i in range(len([k for k in concat_sd if k.endswith(".weight")]))
    }
    n_style = len([k for k in style_sd if k.endswith(".weight")])
    style: Dict[str, Any] = {}
    for i in range(n_style - 1):
        style[f"layer_{i}"] = _dense(style_sd[f"layers.{i}.weight"],
                                     style_sd[f"layers.{i}.bias"])
    style["rgb_out"] = _dense(style_sd[f"layers.{n_style - 1}.weight"],
                              style_sd[f"layers.{n_style - 1}.bias"])
    return {"concat": {"params": concat}, "style": {"params": style}}


def convert_torch_stytrans(
    vgg_sd: Dict[str, Any],
    decoder_sd: Dict[str, Any],
    embedding_sd: Dict[str, Any],
    transformer_sd: Dict[str, Any],
    num_encoder_layers: int = 3,
    num_decoder_layers: int = 3,
) -> Dict[str, Any]:
    """Assemble a full StyTrans param tree from the reference's four torch
    state dicts (vgg_normalised.pth / decoder.pth / embedding_iter_*.pth /
    transformer_iter_*.pth — the exact assets train_temporal_invoke loads,
    /root/reference/train_style_modules.py:339-374).

    The VGG subtree carries all 14 convs; the truncated (reference-parity)
    VggEncoder uses only the first 10 — filter with
    tgtc.train.pretrained._filter_to when overlaying.
    """
    from tgtc.models.decoder import convert_torch_decoder
    from tgtc.models.vgg import convert_torch_vgg

    return {
        "params": {
            "vgg": convert_torch_vgg(vgg_sd)["params"],
            "decode": convert_torch_decoder(decoder_sd)["params"],
            "embedding": convert_torch_patch_embed(embedding_sd)["params"],
            "transformer": convert_torch_transformer(
                transformer_sd, num_encoder_layers, num_decoder_layers
            )["params"],
        }
    }
