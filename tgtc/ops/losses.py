"""Losses and metrics (parity with /root/reference/utils.py:459-463 and
the coherence-loss cosine similarity at /root/reference/VGGNet.py:204)."""

from __future__ import annotations

import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def img2l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def l2_norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(x ** 2) + 1e-8)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
                      eps: float = 1e-8) -> jnp.ndarray:
    """Per-element cosine similarity along ``axis`` (torch.F.cosine_similarity
    semantics; used by the Phase-E cross-view coherence loss,
    /root/reference/train_tgtcs.py:401).

    The eps lives INSIDE the sqrt so the gradient stays finite at zero
    vectors (a ``where``-masked loss still differentiates this branch)."""
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.sqrt(jnp.sum(a * a, axis=axis) + eps * eps)
    nb = jnp.sqrt(jnp.sum(b * b, axis=axis) + eps * eps)
    return dot / (na * nb)
