"""StyTr2-style transformer (content/style encoders + cross decoder).

Ground-up flax rewrite of /root/reference/transformer.py:13-329 and the
PatchEmbed at /root/reference/tctrans.py:13-33:

* ``PatchEmbed``: Conv 3→512, kernel=stride=8 (tokens = (H/8)*(W/8)).
* Two 3-layer **post-norm** encoders (content, style). The reference
  encoder layer has a quirky double projection we reproduce for behavioral
  and checkpoint parity (/root/reference/transformer.py:172-177): with no
  positional embedding, a fused ``qkv`` linear produces q/k/v (v REPLACES
  the residual input), which then pass through the attention block's own
  input projections; with a positional embedding, a fused ``qk`` linear
  projects q=k and v is the raw input.
* A 3-layer decoder whose "self"-attention is actually a second
  cross-attention over the style memory with content-as-query-pos
  (/root/reference/transformer.py:245-257), followed by LayerNorm.
* Content tokens double as the positional embedding (``pos_c = content``,
  /root/reference/tctrans.py:205); the reference's CAPE branch (new_ps /
  averagepooling) is dead code and intentionally omitted.

Attention itself is jax-native scaled dot-product (one fused einsum chain —
XLA maps it onto the MXU); dropout is key-threaded and off at inference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    dim_feedforward: int = 2048
    dropout: float = 0.1
    # computation dtype for the dense/conv matmuls (params stay f32;
    # softmax and LayerNorm statistics stay f32). bf16 doubles the MXU
    # rate on TPU; default f32 preserves bit-parity with torch.
    dtype: Any = jnp.float32
    # "xla": einsum attention (bit-parity oracle, any backend).
    # "flash": fused Pallas flash-attention kernel with in-kernel
    # counter-hash dropout (tgtc.ops.pallas.flash_attention) — never
    # materializes the [B,H,S,S] probs in HBM; auto-falls back to
    # interpret mode off-TPU so tests exercise the same code path.
    attn_impl: str = "xla"


class PatchEmbed(nn.Module):
    """Image → token grid. Conv2d(3, 512, k=8, s=8) parity
    (/root/reference/tctrans.py:26). NHWC in, NHWC token map out."""

    embed_dim: int = 512
    patch_size: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="proj",
            dtype=self.dtype,
        )(x)


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention parity: packed q/k/v input projections
    with bias + output projection. [B, N, C] tensors."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        d_head = self.d_model // self.nhead
        q_p = nn.Dense(self.d_model, name="q_proj", dtype=self.dtype)(q)
        k_p = nn.Dense(self.d_model, name="k_proj", dtype=self.dtype)(k)
        v_p = nn.Dense(self.d_model, name="v_proj", dtype=self.dtype)(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.nhead, d_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q_p), split(k_p), split(v_p)
        if self.attn_impl == "flash":
            from tgtc.ops.pallas.flash_attention import flash_attention

            rate = 0.0 if deterministic else float(self.dropout)
            seed = None
            if rate > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), (), jnp.uint32
                ).astype(jnp.int32)
            out = flash_attention(
                qh, kh, vh,
                sm_scale=1.0 / float(np.sqrt(d_head)),
                dropout_rate=rate, dropout_seed=seed,
                interpret=jax.default_backend() != "tpu",
            )
        elif self.dtype == jnp.bfloat16:
            # TPU fast path: the [B,H,S,S] logits/probs are the step's
            # dominant HBM traffic (268 MB in f32 at S=1024 ×27 attention
            # sites per C1 step). Materialize them in bf16 — softmax
            # statistics still run in f32 *inside* the fusion — and draw
            # the attention-probs dropout mask from uint8 hardware-RNG
            # bits (4× less RNG traffic than bernoulli's uint32 draw).
            # The keep-probability quantizes to 1/256 steps; the scale
            # uses the exact quantized value so E[probs] stays unbiased
            # (round-3 bisect, BASELINE.md).
            attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                              preferred_element_type=jnp.bfloat16)
            attn = attn * jnp.bfloat16(1.0 / np.sqrt(d_head))
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            attn = attn.astype(jnp.bfloat16)
            if not deterministic and self.dropout > 0.0:
                thr = int(round(self.dropout * 256.0))
                keep = 1.0 - thr / 256.0
                bits = jax.random.bits(
                    self.make_rng("dropout"), attn.shape, dtype=jnp.uint8)
                attn = jnp.where(bits >= jnp.uint8(thr),
                                 attn * jnp.bfloat16(1.0 / keep),
                                 jnp.bfloat16(0.0))
        else:
            # logits/softmax in f32 — bit-parity reference path
            attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                              preferred_element_type=jnp.float32)
            attn = attn / jnp.sqrt(d_head).astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if self.attn_impl != "flash":
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.d_model)
        return nn.Dense(self.d_model, name="out_proj", dtype=self.dtype)(out)


class EncoderLayer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, src, pos=None, deterministic: bool = True):
        cfg = self.cfg
        if pos is None:
            # fused qkv; NOTE v replaces src in the residual stream
            # (reference /root/reference/transformer.py:173-174)
            qkv = nn.Dense(3 * cfg.d_model, use_bias=False, name="qkv",
                           dtype=cfg.dtype)(src)
            q, k, src = jnp.split(qkv, 3, axis=-1)
        else:
            qk = nn.Dense(2 * cfg.d_model, use_bias=False, name="qk",
                          dtype=cfg.dtype)(src)
            q, k = jnp.split(qk, 2, axis=-1)
        attn_out = MultiHeadAttention(
            cfg.d_model, cfg.nhead, cfg.dropout, cfg.dtype, cfg.attn_impl,
            name="self_attn"
        )(q, k, src, deterministic)
        src = src + nn.Dropout(cfg.dropout)(attn_out, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        ff = nn.Dense(cfg.dim_feedforward, name="linear1", dtype=cfg.dtype)(src)
        ff = nn.Dropout(cfg.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(cfg.d_model, name="linear2", dtype=cfg.dtype)(ff)
        src = src + nn.Dropout(cfg.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(src)


class DecoderLayer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 deterministic: bool = True):
        cfg = self.cfg

        def with_pos(x, p):
            return x if p is None else x + p

        # first attention: q from tgt(+query_pos), k/v from MEMORY — the
        # reference's DETR-modified "self"-attn
        # (/root/reference/transformer.py:245-250)
        a1 = MultiHeadAttention(
            cfg.d_model, cfg.nhead, cfg.dropout, cfg.dtype, cfg.attn_impl,
            name="self_attn"
        )(with_pos(tgt, query_pos), with_pos(memory, pos), memory,
          deterministic)
        tgt = tgt + nn.Dropout(cfg.dropout)(a1, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(tgt)

        a2 = MultiHeadAttention(
            cfg.d_model, cfg.nhead, cfg.dropout, cfg.dtype, cfg.attn_impl,
            name="cross_attn"
        )(with_pos(tgt, query_pos), with_pos(memory, pos), memory,
          deterministic)
        tgt = tgt + nn.Dropout(cfg.dropout)(a2, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt)

        ff = nn.Dense(cfg.dim_feedforward, name="linear1", dtype=cfg.dtype)(tgt)
        ff = nn.Dropout(cfg.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(cfg.d_model, name="linear2", dtype=cfg.dtype)(ff)
        tgt = tgt + nn.Dropout(cfg.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(tgt)


class StyleTransformer(nn.Module):
    """Full transformer: style/content encoders + cross decoder.

    ``__call__(style_map, content_map)`` takes NHWC token maps from
    PatchEmbed and returns the stylized token map NHWC (parity with
    /root/reference/transformer.py:46-75 where content tokens serve as
    their own positional embedding and the style stream has none).
    """

    cfg: TransformerConfig = TransformerConfig()

    @nn.compact
    def __call__(self, style: jnp.ndarray, content: jnp.ndarray,
                 deterministic: bool = True,
                 pos_mode: str = "ics") -> jnp.ndarray:
        """``pos_mode`` selects the reference's positional-embedding pattern
        (/root/reference/tctrans.py:204-220):

        * ``"ics"`` — the main stylize call ``transformer(style, mask,
          content, pos_c=content, pos_s=None)``: style encoder takes the
          fused-qkv branch, content encoder the qk branch, decoder
          query_pos = content tokens.
        * ``"icc"`` — identity call with pos on BOTH encoders
          (``pos_s = pos_c = content``); decoder pos AND query_pos set.
        * ``"iss"`` — identity call with NO pos anywhere: both encoders
          take the fused-qkv branch, decoder gets no pos.

        In the encoder ``pos`` only selects the projection branch — the
        reference never adds it there (/root/reference/transformer.py:
        172-177); the decoder genuinely adds it (:245-257).
        """
        cfg = self.cfg
        b, hs, ws, c = style.shape
        # output tokens follow the CONTENT grid — content and style maps
        # may differ in size (e.g. full-res C3 stylization vs a 512² style)
        _, hc, wc, _ = content.shape
        s = style.reshape(b, hs * ws, c)
        ct = content.reshape(b, -1, c)
        if pos_mode == "ics":
            pos_s, pos_c = None, ct
        elif pos_mode == "icc":
            pos_s, pos_c = s, ct
        elif pos_mode == "iss":
            pos_s, pos_c = None, None
        else:
            raise ValueError(f"unknown pos_mode {pos_mode!r}")

        for i in range(cfg.num_encoder_layers):
            s = EncoderLayer(cfg, name=f"enc_s_{i}")(s, pos=pos_s,
                                                     deterministic=deterministic)
        for i in range(cfg.num_encoder_layers):
            ct = EncoderLayer(cfg, name=f"enc_c_{i}")(ct, pos=pos_c,
                                                      deterministic=deterministic)
        out = ct
        for i in range(cfg.num_decoder_layers):
            out = DecoderLayer(cfg, name=f"dec_{i}")(
                out, s, pos=pos_s, query_pos=pos_c,
                deterministic=deterministic,
            )
        out = nn.LayerNorm(name="dec_norm")(out)
        return out.reshape(b, hc, wc, c)
