"""AdaIN-path decoder trainers — the reference's alternate 2D pipeline.

Rebuilds ``finetune_decoder`` and ``train_temporal_decoder``
(/root/reference/train_style_modules.py:187-246,545-685): train the CNN
decoder under the classic AdaIN objective (content + per-stage mean/std
style loss), optionally with the same point-splat temporal-consistency term
as the StyTrans path. Off the reference's main path but part of its
capability surface (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tgtc.models.adain_net import AdainNet
from tgtc.ops.rasterize import ndc_to_world, rasterize_warp


@dataclasses.dataclass(frozen=True)
class AdainTrainConfig:
    lr: float = 1e-4
    lr_decay: float = 0.0  # reference adjust_learning_rate:
    #   lr / (1 + lr_decay * iter) every iteration
    #   (/root/reference/train_style_modules.py:180-184,225,618)
    content_weight: float = 1.0
    style_weight: float = 10.0
    temporal_weight: float = 3500.0
    space_dist_threshold: float = 5e-2
    max_iter: int = 160000


class AdainTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _decoder_only_tx(cfg: AdainTrainConfig) -> optax.GradientTransformation:
    def labels(params):
        return {
            "params": {
                k: jax.tree.map(
                    lambda _: "train" if k == "decode" else "frozen", v
                )
                for k, v in params["params"].items()
            }
        }

    if cfg.lr_decay > 0.0:
        tx = optax.adam(
            learning_rate=lambda step: cfg.lr / (1.0 + cfg.lr_decay * step)
        )
    else:
        tx = optax.adam(cfg.lr)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        param_labels=labels,
    )


def init_adain_train(params: Any, cfg: AdainTrainConfig) -> AdainTrainState:
    tx = _decoder_only_tx(cfg)
    return AdainTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))


def make_adain_finetune_step(model: AdainNet, cfg: AdainTrainConfig):
    """``finetune_decoder`` parity: decoder-only AdaIN training
    (/root/reference/train_style_modules.py:187-246)."""
    tx = _decoder_only_tx(cfg)

    def step_fn(state: AdainTrainState, content, style):
        def loss_fn(params):
            out = model.apply(params, content, style,
                              method=model.compute_losses)
            loss = (cfg.content_weight * out["loss_c"]
                    + cfg.style_weight * out["loss_s"])
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            AdainTrainState(step=state.step + 1, params=params,
                            opt_state=opt_state),
            {"loss": loss, "loss_c": out["loss_c"], "loss_s": out["loss_s"]},
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_adain_temporal_step(
    model: AdainNet,
    cfg: AdainTrainConfig,
    proj: jnp.ndarray,
    h: int,
    w: int,
    is_ndc: bool = True,
    focal: float = 1.0,
):
    """``train_temporal_decoder`` parity: AdaIN losses + the view-0 splat
    temporal loss (/root/reference/train_style_modules.py:545-685)."""
    tx = _decoder_only_tx(cfg)

    def step_fn(state: AdainTrainState, content, coor, cps, style):
        def loss_fn(params):
            out = model.apply(params, content, style,
                              method=model.compute_losses)
            g = out["stylized"]
            coor_world = ndc_to_world(coor, h, w, focal) if is_ndc else coor
            warped_rgb, warped_coor, mask = rasterize_warp(
                coor_world[0].reshape(-1, 3), g[0].reshape(-1, 3),
                cps, proj, h, w,
            )
            dist2 = jnp.sum((warped_coor - coor_world) ** 2, -1, keepdims=True)
            occl = (dist2 < cfg.space_dist_threshold ** 2).astype(g.dtype)
            loss_t = cfg.temporal_weight * jnp.mean(
                (g - warped_rgb) ** 2 * mask * occl
            )
            loss = (cfg.content_weight * out["loss_c"]
                    + cfg.style_weight * out["loss_s"] + loss_t)
            return loss, {"loss_c": out["loss_c"], "loss_s": out["loss_s"],
                          "loss_t": loss_t}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            AdainTrainState(step=state.step + 1, params=params,
                            opt_state=opt_state),
            {"loss": loss, **aux},
        )

    return jax.jit(step_fn, donate_argnums=(0,))
