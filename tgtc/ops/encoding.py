"""NeRF positional (Fourier-feature) encoding.

Behavioral parity with the reference `Embedder` (/root/reference/models.py:24-60):
log-spaced frequency bands ``2**0 .. 2**(L-1)``, per-frequency ``sin`` then
``cos`` over the full input vector, with the raw input prepended.

TPU notes: the encoding is a pure VPU op; it is expressed as one broadcasted
multiply + sin/cos so XLA fuses it straight into the consumer matmul's
producer epilogue. Output feature order matches the reference exactly
(``[x, sin(x*f0), cos(x*f0), sin(x*f1), ...]``) so torch-trained weights can
be converted layer-for-layer.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    """Feature size produced by :func:`positional_encoding`."""
    out = input_dim * num_freqs * 2
    if include_input:
        out += input_dim
    return out


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x[..., D]`` into ``[..., encoding_dim(D, num_freqs)]``.

    Matches reference frequency schedule ``2**linspace(0, L-1, L)``
    (/root/reference/models.py:39-42 with ``max_freq_log2 = L-1``).
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)

    # (..., F, D) = (..., 1, D) * (F, 1)-broadcast
    xf = x[..., None, :] * freqs[:, None]
    # stack as (..., F, 2, D) so the flattened order is
    # [sin(f0)*D, cos(f0)*D, sin(f1)*D, ...] — the reference's interleaving.
    enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
