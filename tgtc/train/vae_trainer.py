"""VAE training over style features (reference ``train_vae``,
/root/reference/train_style_modules.py:249-303): VGG relu4_1 features of
style images → [mean ‖ std] 1024-d vectors → VAE recon + KL.

Also provides :func:`vgg_style_feature` (the 1024-d descriptor the VAE
consumes) and the Phase-D latent-table seeding helper
(/root/reference/train_tgtcs.py:128-158).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tgtc.models.vae import Vae, VaeConfig, make_vae, vae_loss
from tgtc.models.vgg import VggEncoder


@dataclasses.dataclass(frozen=True)
class VaeTrainConfig:
    lr: float = 1e-3
    lr_decay: float = 0.0  # reference adjust_learning_rate:
    #   lr / (1 + lr_decay * iter) every iteration
    #   (/root/reference/train_style_modules.py:180-184,280)
    max_iter: int = 160000
    batch_size: int = 8
    kl_lambda: float = 0.1


class VaeTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def vgg_style_feature(vgg: VggEncoder, vgg_params, images: jnp.ndarray
                      ) -> jnp.ndarray:
    """[B, 1024] = [channel-mean ‖ channel-std] of relu4_1 features
    (parity with the reference's feature construction,
    /root/reference/train_style_modules.py:267-279)."""
    feats = vgg.apply(vgg_params, images)
    f4 = feats[3]  # relu4_1, 512 channels
    mean = jnp.mean(f4, axis=(1, 2))
    # reference: calc_mean_std → sqrt(unbiased var + 1e-5)
    # (/root/reference/train_style_modules.py:277-279)
    std = jnp.sqrt(jnp.var(f4, axis=(1, 2), ddof=1) + 1e-5)
    return jnp.concatenate([mean, std], axis=-1)


def _vae_tx(tcfg: VaeTrainConfig) -> optax.GradientTransformation:
    if tcfg.lr_decay > 0.0:
        return optax.adam(
            learning_rate=lambda step: tcfg.lr / (1.0 + tcfg.lr_decay * step)
        )
    return optax.adam(tcfg.lr)


def init_vae_train(key: jax.Array, cfg: VaeConfig, tcfg: VaeTrainConfig
                   ) -> Tuple[Vae, VaeTrainState]:
    model, params = make_vae(cfg, key)
    tx = _vae_tx(tcfg)
    return model, VaeTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_vae_train_step(model: Vae, tcfg: VaeTrainConfig):
    tx = _vae_tx(tcfg)

    def step_fn(state: VaeTrainState, x: jnp.ndarray, key: jax.Array):
        k = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            y, z, mu, logvar = model.apply(params, x, k)
            loss, parts = vae_loss(x, y, mu, logvar, tcfg.kl_lambda)
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            VaeTrainState(step=state.step + 1, params=params,
                          opt_state=opt_state),
            {"loss": loss, **parts},
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def seed_latents_from_features(
    key: jax.Array,
    vae: Vae,
    vae_params,
    style_features: jnp.ndarray,   # [S, 1024]
    frame_num: int,
) -> Dict[str, jnp.ndarray]:
    """Phase D: encode style features → per-style (mu, logvar); seed the
    latent table by reparameterized sampling
    (/root/reference/train_tgtcs.py:128-158, models.py:535-539)."""
    from tgtc.models.style_field import set_latents_from_vae

    mu, logvar = vae.apply(vae_params, style_features, method=vae.encode)
    s, d = mu.shape
    init = {
        "latents": jnp.zeros((s, frame_num, d)),
        "mu": mu,
        "logvar": logvar,
    }
    return set_latents_from_vae(key, init, mu, logvar)
