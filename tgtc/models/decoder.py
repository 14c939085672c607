"""CNN decoder (512-ch features → RGB) in flax.

Rewrite of the reference decoder (/root/reference/tctrans.py:36-66, same
copy at /root/reference/VGGNet.py:7-37): reflection-padded 3x3 convs with
ReLU and three 2x nearest-neighbor upsamples; final conv has no activation.
NHWC layout; ``convert_torch_decoder`` maps a torch ``decoder.pth``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tgtc.models.vgg import reflect_pad

# (name, out_ch, upsample_before)
_LAYERS = (
    ("dconv0", 256, False),
    ("dconv1", 256, True),
    ("dconv2", 256, False),
    ("dconv3", 256, False),
    ("dconv4", 128, False),
    ("dconv5", 128, True),
    ("dconv6", 64, False),
    ("dconv7", 64, True),
    ("dconv8", 3, False),
)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class Decoder(nn.Module):
    # computation dtype (params stay f32); see VggEncoder.dtype
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(_LAYERS)
        for i, (name, ch, up) in enumerate(_LAYERS):
            if up:
                x = upsample_nearest(x)
            x = nn.Conv(ch, (3, 3), padding="VALID", name=name,
                        dtype=self.dtype)(reflect_pad(x))
            if i < n - 1:
                x = nn.relu(x)
        return x


def make_decoder(key: jax.Array, size: int = 32) -> Tuple[Decoder, Any]:
    model = Decoder()
    params = model.init(key, jnp.zeros((1, size, size, 512)))
    return model, params


# torch sequential conv indices in the reference decoder
# (/root/reference/tctrans.py:36-66).
_TORCH_IDX = (1, 5, 8, 11, 14, 18, 21, 25, 28)


def convert_torch_decoder(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    import numpy as np

    params: Dict[str, Any] = {}
    for (name, _, _), idx in zip(_LAYERS, _TORCH_IDX):
        w = np.asarray(state_dict[f"{idx}.weight"])
        b = np.asarray(state_dict[f"{idx}.bias"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
