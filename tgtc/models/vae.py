"""MLP VAE over 1024-d style-feature vectors.

Rewrite of the reference ``VAE`` (/root/reference/models.py:371-473):
encoder/decoder are D-1 relu Dense layers at width W; latent 32-d;
loss = sum-of-feature-mean squared recon + kl_lambda * KL. Used frozen in
Phases D/E to seed the latent table; trainable via tgtc.train.vae_trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    data_dim: int = 1024
    latent_dim: int = 32
    width: int = 512
    depth: int = 4
    kl_lambda: float = 0.1


class VaeEncoder(nn.Module):
    cfg: VaeConfig

    @nn.compact
    def __call__(self, x):
        for i in range(self.cfg.depth - 1):
            x = nn.relu(nn.Dense(self.cfg.width, name=f"fc_{i}")(x))
        mu = nn.Dense(self.cfg.latent_dim, name="mu")(x)
        logvar = nn.Dense(self.cfg.latent_dim, name="logvar")(x)
        return mu, logvar


class VaeDecoder(nn.Module):
    cfg: VaeConfig

    @nn.compact
    def __call__(self, z):
        for i in range(self.cfg.depth - 1):
            z = nn.relu(nn.Dense(self.cfg.width, name=f"fc_{i}")(z))
        return nn.Dense(self.cfg.data_dim, name="out")(z)


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
                   factor: float = 1.0) -> jnp.ndarray:
    """z = mu + eps * std (parity /root/reference/models.py:421-424)."""
    std = jnp.exp(0.5 * logvar) * factor
    return mu + jax.random.normal(key, mu.shape, mu.dtype) * std


class Vae(nn.Module):
    cfg: VaeConfig

    def setup(self):
        self.encoder = VaeEncoder(self.cfg)
        self.decoder = VaeDecoder(self.cfg)

    def __call__(self, x, key=None):
        mu, logvar = self.encoder(x)
        z = reparameterize(key, mu, logvar) if key is not None else mu
        y = self.decoder(z)
        return y, z, mu, logvar

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


def vae_loss(x: jnp.ndarray, y: jnp.ndarray, mu: jnp.ndarray,
             logvar: jnp.ndarray, kl_lambda: float = 0.1
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Recon = sum over features of batch-mean squared error; KL standard.
    (parity with /root/reference/models.py:459-466)."""
    kl = jnp.mean(
        -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
    )
    recon = jnp.sum(jnp.mean((x - y) ** 2, axis=0))
    loss = recon + kl_lambda * kl
    return loss, {"recon": recon, "kl": kl_lambda * kl}


def make_vae(cfg: VaeConfig, key: jax.Array) -> Tuple[Vae, Any]:
    model = Vae(cfg)
    params = model.init(key, jnp.zeros((1, cfg.data_dim)))
    return model, params
