"""Classic AdaIN style-transfer network (the reference's alternate 2D
stylizer).

Rewrite of ``Net`` (/root/reference/VGGNet.py:95-166): 4-stage VGG split,
AdaIN bottleneck, CNN decoder; content loss on the AdaIN target, style loss
as per-stage mean/std MSE. Reachable in the reference via
``finetune_decoder`` / ``train_temporal_decoder``
(/root/reference/train_style_modules.py:187-246,545-685) — provided here so
the AdaIN path is a first-class alternative to StyTrans.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tgtc.models.decoder import Decoder
from tgtc.models.vgg import VggEncoder
from tgtc.ops.style import adaptive_instance_normalization, calc_mean_std


def mse(a, b):
    return jnp.mean((a - b) ** 2)


class AdainNet(nn.Module):
    """``stylize(content, style, alpha)`` → image;
    ``compute_losses(content, style)`` → dict(loss_c, loss_s, stylized)."""

    def setup(self):
        self.vgg = VggEncoder()
        self.decode = Decoder()

    def _encode(self, x) -> List[jnp.ndarray]:
        return self.vgg(x)

    def stylize(self, content: jnp.ndarray, style: jnp.ndarray,
                alpha: float = 1.0) -> jnp.ndarray:
        c_feats = self._encode(content)
        s_feats = self._encode(style)
        t = adaptive_instance_normalization(c_feats[3], s_feats[3])
        t = alpha * t + (1.0 - alpha) * c_feats[3]
        return self.decode(t)

    def __call__(self, content, style, alpha: float = 1.0):
        return self.stylize(content, style, alpha)

    def compute_losses(self, content: jnp.ndarray, style: jnp.ndarray
                       ) -> Dict[str, jnp.ndarray]:
        c_feats = self._encode(content)
        s_feats = self._encode(style)
        t = adaptive_instance_normalization(c_feats[3], s_feats[3])
        t = jax.lax.stop_gradient(t)
        g = self.decode(t)
        g_feats = self._encode(g)

        loss_c = mse(g_feats[3], t)
        loss_s = jnp.zeros(())
        for i in range(4):
            gm, gs = calc_mean_std(g_feats[i])
            sm, ss = calc_mean_std(jax.lax.stop_gradient(s_feats[i]))
            loss_s = loss_s + mse(gm, sm) + mse(gs, ss)
        return {"stylized": g, "loss_c": loss_c, "loss_s": loss_s}


def make_adain_net(key: jax.Array, image_size: int = 32
                   ) -> Tuple[AdainNet, Any]:
    model = AdainNet()
    x = jnp.zeros((1, image_size, image_size, 3))
    params = model.init(key, x, x, method=model.compute_losses)
    return model, params
