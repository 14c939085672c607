"""StyTrans — the full 2D stylization network + its training losses.

Rewrite of /root/reference/tctrans.py:138-245: a frozen 5-stage VGG feature
pyramid, PatchEmbed → StyleTransformer → CNN decoder, with

* content loss: MSE of mean-std-normalized relu4_1/relu5_1 features
  (/root/reference/tctrans.py:212)
* style loss: per-stage mean/std MSE over all 5 stages (:214-216)
* identity losses: Icc/Iss pixel identity (l_id1, :219-223) and per-stage
  feature identity (l_id2, :226-230)

All NHWC. The VGG is passed in frozen (stop_gradient on its features is the
caller's choice — in training only transformer+embedding (+decoder in C2)
receive gradients via optax masking, so no explicit freezing is needed).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tgtc.models.decoder import Decoder
from tgtc.models.transformer import PatchEmbed, StyleTransformer, TransformerConfig
from tgtc.models.vgg import VggEncoder
from tgtc.ops.style import calc_mean_std, mean_variance_norm


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


class StyTrans(nn.Module):
    """Stylization net. ``stylize`` is the inference path (returns the image
    and the 512-d token map ``hs`` used for the 1024-d style feature,
    /root/reference/tctrans.py:233-245); ``compute_losses`` the training
    path."""

    cfg: TransformerConfig = TransformerConfig()

    def setup(self):
        self.vgg = VggEncoder(dtype=self.cfg.dtype)
        self.embedding = PatchEmbed(embed_dim=self.cfg.d_model,
                                    dtype=self.cfg.dtype)
        self.transformer = StyleTransformer(self.cfg)
        self.decode = Decoder(dtype=self.cfg.dtype)

    def _transform(self, content, style, deterministic=True,
                   pos_mode="ics"):
        s_tok = self.embedding(style)
        c_tok = self.embedding(content)
        hs = self.transformer(s_tok, c_tok, deterministic=deterministic,
                              pos_mode=pos_mode)
        # outputs are f32 regardless of the internal compute dtype
        return (self.decode(hs).astype(jnp.float32),
                hs.astype(jnp.float32))

    def __call__(self, content, style, deterministic: bool = True):
        return self._transform(content, style, deterministic)

    def stylize(self, content: jnp.ndarray, style: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._transform(content, style, deterministic=True)

    def encode_pyramid(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        return self.vgg(x)

    def compute_losses(self, content: jnp.ndarray, style: jnp.ndarray,
                       deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        f32 = lambda feats: [f.astype(jnp.float32) for f in feats]
        content_feats = f32(self.vgg(content))
        style_feats = f32(self.vgg(style))

        ics, _ = self._transform(content, style, deterministic)
        ics_feats = f32(self.vgg(ics))

        loss_c = mse(
            mean_variance_norm(ics_feats[-1]),
            mean_variance_norm(jax.lax.stop_gradient(content_feats[-1])),
        ) + mse(
            mean_variance_norm(ics_feats[-2]),
            mean_variance_norm(jax.lax.stop_gradient(content_feats[-2])),
        )

        loss_s = jnp.zeros(())
        for i in range(5):
            im, istd = calc_mean_std(ics_feats[i])
            tm, tstd = calc_mean_std(jax.lax.stop_gradient(style_feats[i]))
            loss_s = loss_s + mse(im, tm) + mse(istd, tstd)

        # identity calls use DIFFERENT pos patterns than the main call:
        # Icc = transformer(content, mask, content, pos_c, pos_c) and
        # Iss = transformer(style, mask, style, None, None)
        # (/root/reference/tctrans.py:219-220)
        icc, _ = self._transform(content, content, deterministic,
                                 pos_mode="icc")
        iss, _ = self._transform(style, style, deterministic,
                                 pos_mode="iss")
        l_id1 = mse(icc, content) + mse(iss, style)

        icc_feats = f32(self.vgg(icc))
        iss_feats = f32(self.vgg(iss))
        l_id2 = jnp.zeros(())
        for i in range(5):
            l_id2 = (
                l_id2
                + mse(icc_feats[i], jax.lax.stop_gradient(content_feats[i]))
                + mse(iss_feats[i], jax.lax.stop_gradient(style_feats[i]))
            )

        return {
            "ics": ics,
            "loss_c": loss_c,
            "loss_s": loss_s,
            "l_id1": l_id1,
            "l_id2": l_id2,
        }


def make_stytrans(
    key: jax.Array,
    cfg: TransformerConfig = TransformerConfig(),
    image_size: int = 32,
) -> Tuple[StyTrans, Any]:
    """Initialize a StyTrans with ALL submodule params materialized (init
    must trace ``compute_losses`` — the plain ``__call__`` path never touches
    the VGG, so its params would be missing)."""
    model = StyTrans(cfg)
    x = jnp.zeros((1, image_size, image_size, 3))
    params = model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        x, x, True, method=model.compute_losses,
    )
    return model, params


def style_feature_from_tokens(hs: jnp.ndarray) -> jnp.ndarray:
    """1024-d per-image style descriptor: [token-mean ‖ token-var] of the
    512-d stylized token map (parity with /root/reference/trans_test.py
    feature accumulation)."""
    b = hs.shape[0]
    tok = hs.reshape(b, -1, hs.shape[-1])
    # torch-var parity: unbiased (/root/reference/trans_test.py:176)
    return jnp.concatenate(
        [tok.mean(axis=1), tok.var(axis=1, ddof=1)], axis=-1)
