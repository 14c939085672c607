"""3D style field: the two style MLPs + the variational latent table.

Rewrites of the reference's Phase-E modules:

* :class:`StyleMLPBeforeConcat` — ``StyleMLP_before_concat``
  (/root/reference/models.py:120-147): input = embedded pts (63) + latent,
  the latent re-injected at EVERY layer, the raw embedding re-injected at
  the skip layer, output 256-d ``concat_features``. Note the reference's
  layer-construction loop ``break``s at the skip, yielding skip+1 layers
  (5 for style_D=8) — reproduced.
* :class:`StyleMLPWildMultilayers` — ``StyleMLP_Wild_multilayers``
  (/root/reference/models.py:149-180): input = concat(base_remap 256,
  concat_features 256) + embedded pts + per-layer latent; D-1 hidden layers
  + sigmoid RGB out.
* :class:`StyleLatents` — ``StyleLatents_variational``
  (/root/reference/models.py:475-547): learnable table
  ``[style_num, frame_num, latent]`` + per-style mu/logvar buffers;
  lookup shrinks toward mu by ``sigma_scale``; ``minus_logp`` Gaussian
  prior; reseeding from VAE stats. The reference's llff branch tiles the
  table x7 before indexing (/root/reference/models.py:496) — kept behind
  the ``llff_tile`` flag as a documented quirk.

All take flat ``[R', ...]`` batches (rays x samples flattened) so they ride
the same feature pipeline as the NeRF trunk.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StyleFieldConfig:
    style_d: int = 8            # reference --style_D
    width: int = 256            # reference --netwidth
    latent_dim: int = 32        # reference --vae_latent
    embed_dim: int = 63         # embed_freq_coor*6 + 3
    skip: int = 4


class StyleMLPBeforeConcat(nn.Module):
    cfg: StyleFieldConfig

    @nn.compact
    def __call__(self, x_embed: jnp.ndarray, latent: jnp.ndarray
                 ) -> jnp.ndarray:
        cfg = self.cfg
        # layer count: the reference loop breaks AT the skip → skip+1 layers
        n_layers = min(cfg.style_d - 1, cfg.skip + 1)
        h = x_embed
        for i in range(n_layers):
            h = jnp.concatenate([h, latent], axis=-1)
            if i == cfg.skip:
                h = jnp.concatenate([h, x_embed], axis=-1)
            h = nn.relu(nn.Dense(cfg.width, name=f"layer_{i}")(h))
        return h  # concat_features [R', width]


class StyleMLPWildMultilayers(nn.Module):
    cfg: StyleFieldConfig

    @nn.compact
    def __call__(self, x_embed: jnp.ndarray, concated: jnp.ndarray,
                 latent: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = jnp.concatenate([concated, x_embed], axis=-1)
        for i in range(cfg.style_d - 1):
            h = jnp.concatenate([h, latent], axis=-1)
            if i == cfg.skip:
                h = jnp.concatenate([h, x_embed], axis=-1)
            h = nn.relu(nn.Dense(cfg.width, name=f"layer_{i}")(h))
        h = jnp.concatenate([h, latent], axis=-1)
        rgb = nn.sigmoid(nn.Dense(3, name="rgb_out")(h))
        return rgb


def make_style_mlps(
    cfg: StyleFieldConfig, key: jax.Array
) -> Tuple[StyleMLPBeforeConcat, Any, StyleMLPWildMultilayers, Any]:
    k1, k2 = jax.random.split(key)
    concat_model = StyleMLPBeforeConcat(cfg)
    p1 = concat_model.init(
        k1, jnp.zeros((1, cfg.embed_dim)), jnp.zeros((1, cfg.latent_dim))
    )
    style_model = StyleMLPWildMultilayers(cfg)
    # concated input = NeRF base_remap (256, fixed by the trunk head at
    # /root/reference/models.py:85) + concat_features (cfg.width)
    p2 = style_model.init(
        k2,
        jnp.zeros((1, cfg.embed_dim)),
        jnp.zeros((1, 256 + cfg.width)),
        jnp.zeros((1, cfg.latent_dim)),
    )
    return concat_model, p1, style_model, p2


# ---------------------------------------------------------------- latents


# The latent table is a plain pytree (not a flax module): it trains under
# its OWN optimizer (/root/reference/train_tgtcs.py:344,495;
# /root/reference/models.py:541-547), which in optax is simply a separate
# optimizer over this subtree.


def init_latents(
    key: jax.Array, style_num: int, frame_num: int, latent_dim: int
) -> Dict[str, jnp.ndarray]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "latents": jax.random.normal(k1, (style_num, frame_num, latent_dim)),
        "mu": jax.random.normal(k2, (style_num, latent_dim)),
        "logvar": jax.random.normal(k3, (style_num, latent_dim)),
    }


def set_latents_from_vae(
    key: jax.Array, latent_state: Dict[str, jnp.ndarray],
    mu: jnp.ndarray, logvar: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Reseed the table by reparameterized sampling from per-style VAE stats
    (parity with ``set_latents``, /root/reference/models.py:535-539)."""
    s, f, d = latent_state["latents"].shape
    mu_e = jnp.broadcast_to(mu[:, None, :], (s, f, d))
    logvar_e = jnp.broadcast_to(logvar[:, None, :], (s, f, d))
    eps = jax.random.normal(key, (s, f, d))
    return {
        "latents": eps * jnp.exp(0.5 * logvar_e) + mu_e,
        "mu": mu,
        "logvar": logvar,
    }


def lookup_latents(
    latent_state: Dict[str, jnp.ndarray],
    style_ids: jnp.ndarray,
    frame_ids: jnp.ndarray,
    sigma_scale: float = 1.0,
    llff_tile: bool = True,
) -> jnp.ndarray:
    """Per-ray latent lookup with shrinkage toward the style mean
    (parity with forward, /root/reference/models.py:490-506).

    Note: the llff x7 tiling exists so novel-view frame ids (up to 120
    spiral poses) stay in range for scenes with >=18 training frames (fern
    has 20). For smaller scenes jnp's clamping gather returns the last row
    instead of crashing (torch would raise) — acceptable because novel-view
    latents are style-mean-shrunk anyway."""
    s, f, d = latent_state["latents"].shape
    flat_ids = style_ids * f + frame_ids
    table = latent_state["latents"].reshape(-1, d)
    if llff_tile:
        # reference quirk: table tiled x7 before flat indexing
        # (/root/reference/models.py:496)
        table = jnp.tile(table, (7, 1))
    latents = table[flat_ids]
    mu = latent_state["mu"][style_ids]
    return mu + sigma_scale * (latents - mu)


def latent_minus_logp(
    latent_state: Dict[str, jnp.ndarray],
    style_ids: jnp.ndarray,
    frame_ids: jnp.ndarray,
    sigma_scale: float = 1.0,
    llff_tile: bool = True,
    epsilon: float = 1e-3,
) -> jnp.ndarray:
    """Gaussian prior loss on the looked-up latents
    (parity with ``minus_logp``, /root/reference/models.py:526-533 — note
    the reference divides by std + eps, not variance; kept)."""
    latents = lookup_latents(
        latent_state, style_ids, frame_ids, sigma_scale, llff_tile
    )
    mu = jax.lax.stop_gradient(latent_state["mu"][style_ids])
    logvar = jax.lax.stop_gradient(latent_state["logvar"][style_ids])
    return jnp.mean(
        jnp.sum((latents - mu) ** 2 / (jnp.exp(0.5 * logvar) + epsilon), -1)
    )
