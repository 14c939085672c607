"""AdaIN / style-statistics ops.

Rewrites /root/reference/Style_function.py:4-88 and
/root/reference/function.py:4-73 as pure NHWC jnp functions:
channel mean/std, adaptive instance normalization, mean-std normalization
(``normal``), Gram-matrix style loss, and CORAL color transfer.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, channel) spatial mean/std of NHWC features
    (parity with /root/reference/Style_function.py:4-12)."""
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    # torch .var() defaults to UNBIASED (n-1) — ddof=1 is load-bearing for
    # numeric parity with the reference losses (caught by
    # tests/test_stytrans_parity.py)
    var = jnp.var(feat, axis=(1, 2), keepdims=True, ddof=1)
    return mean, jnp.sqrt(var + eps)


def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray
                                    ) -> jnp.ndarray:
    """AdaIN: renormalize content features to style statistics
    (parity with /root/reference/Style_function.py:15-24)."""
    c_mean, c_std = calc_mean_std(content)
    s_mean, s_std = calc_mean_std(style)
    return (content - c_mean) / c_std * s_std + s_mean


def mean_variance_norm(feat: jnp.ndarray) -> jnp.ndarray:
    """Mean-std normalize (the reference's ``normal``,
    /root/reference/function.py:22-26; used by StyTrans content loss)."""
    mean, std = calc_mean_std(feat)
    return (feat - mean) / std


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """[B, C, C] Gram of NHWC features, normalized by C*H*W
    (parity with ``GramMatrix``, /root/reference/Style_function.py:47-53)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


def gram_style_loss(input_feat: jnp.ndarray, target_feat: jnp.ndarray
                    ) -> jnp.ndarray:
    gi, gt = gram_matrix(input_feat), gram_matrix(target_feat)
    return jnp.mean((gi - gt) ** 2)


def coral(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """CORAL color transfer on [H, W, 3] images in [0,1]
    (parity with /root/reference/Style_function.py:56-88)."""
    def flat(x):  # [3, N]
        return x.reshape(-1, 3).T

    def norm_stats(f):
        mean = f.mean(axis=1, keepdims=True)
        std = f.std(axis=1, keepdims=True) + 1e-8
        return (f - mean) / std, mean, std

    sf, _, _ = norm_stats(flat(source))
    tf, t_mean, t_std = norm_stats(flat(target))

    def cov(f):
        return f @ f.T + jnp.eye(3)

    def inv_sqrt(m):
        vals, vecs = jnp.linalg.eigh(m)
        return vecs @ jnp.diag(vals ** -0.5) @ vecs.T

    def sqrt_m(m):
        vals, vecs = jnp.linalg.eigh(m)
        return vecs @ jnp.diag(vals ** 0.5) @ vecs.T

    s_white = inv_sqrt(cov(sf)) @ sf
    s_colored = sqrt_m(cov(tf)) @ s_white
    out = s_colored * t_std + t_mean
    return out.T.reshape(source.shape)
