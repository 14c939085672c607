"""VGG-19 feature encoder (normalised-VGG layout) in flax.

Ground-up rewrite of the reference's hand-specified sequential VGG
(/root/reference/tctrans.py:68-122 and the identical copy at
/root/reference/VGGNet.py:39-93): a 1x1 input conv (the "vgg_normalised"
RGB remap) followed by 3x3 reflection-padded convs with ReLU and ceil-mode
2x2 max-pools. Feature pyramid taps at relu1_1/relu2_1/relu3_1/relu4_1/
relu5_1 — the stage boundaries used by StyTrans
(/root/reference/tctrans.py:145-149).

Data layout is NHWC (TPU-native; torch is NCHW). ``convert_torch_vgg``
maps a torch ``vgg_normalised.pth`` sequential state-dict onto these
params (OIHW → HWIO) so the published pretrained weights load directly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Ops per pyramid stage, in order. "pool" marks the ceil-mode max-pool,
# which the reference places AFTER each stage's trailing convs — between
# conv1_2 and conv2_1 etc. (/root/reference/tctrans.py:75-78), NOT at the
# stage boundary (caught by tests/test_stytrans_parity.py).
_STAGES: Tuple[Tuple[Any, ...], ...] = (
    (("conv0", 3), ("conv1_1", 64)),                      # → relu1_1
    (("conv1_2", 64), "pool", ("conv2_1", 128)),          # → relu2_1
    (("conv2_2", 128), "pool", ("conv3_1", 256)),         # → relu3_1
    (("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
     "pool", ("conv4_1", 512)),                           # → relu4_1
    (("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
     "pool", ("conv5_1", 512)),                           # → relu5_1
)


def reflect_pad(x: jnp.ndarray, p: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def ceil_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max-pool with ceil_mode=True (torch parity: odd spatial
    dims keep their last row/col by -inf padding)."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(
            x, ((0, 0), (0, ph), (0, pw), (0, 0)),
            constant_values=-jnp.inf,
        )
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class VggEncoder(nn.Module):
    """Returns the 5-level feature pyramid [relu1_1 ... relu5_1] for NHWC
    input in [0, 1] (the normalised VGG consumes raw RGB; no mean/std
    preprocessing, parity with the reference).

    ``truncated=True`` (default) reproduces the de-facto reference: StyTrans
    is always constructed with ``vgg[:31]`` (/root/reference/trans_train.py:
    113-115, /root/reference/train_style_modules.py:344), so its
    ``enc_5 = layers[31:44]`` slice of a 31-layer list is an EMPTY
    Sequential — the "relu5_1" pyramid level is identically relu4_1 (no
    pool, no convs). Set ``truncated=False`` for a genuine relu5_1.
    """

    truncated: bool = True
    # computation dtype for the convs (params stay f32). bf16 doubles the
    # MXU rate on TPU; the default stays f32 for bit-parity with torch.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        first = True
        for si, stage in enumerate(_STAGES):
            if si == 4 and self.truncated:
                feats.append(x)  # empty enc_5: relu5_1 == relu4_1
                break
            for op in stage:
                if op == "pool":
                    x = ceil_max_pool(x)
                    continue
                name, ch = op
                if first:
                    # 1x1 RGB remap conv, no padding, no relu
                    x = nn.Conv(ch, (1, 1), name=name, dtype=self.dtype)(x)
                    first = False
                else:
                    x = nn.Conv(ch, (3, 3), padding="VALID", name=name,
                                dtype=self.dtype)(reflect_pad(x))
                    x = nn.relu(x)
            feats.append(x)
        return feats


def make_vgg(key: jax.Array, image_size: int = 64) -> Tuple[VggEncoder, Any]:
    model = VggEncoder()
    params = model.init(key, jnp.zeros((1, image_size, image_size, 3)))
    return model, params


# torch sequential index → our conv name, for vgg_normalised.pth conversion
# (indices follow /root/reference/tctrans.py:68-122).
_TORCH_IDX_TO_NAME = {
    0: "conv0",
    2: "conv1_1", 5: "conv1_2",
    9: "conv2_1", 12: "conv2_2",
    16: "conv3_1", 19: "conv3_2", 22: "conv3_3", 25: "conv3_4",
    29: "conv4_1", 32: "conv4_2", 35: "conv4_3", 38: "conv4_4",
    42: "conv5_1",
}


def convert_torch_vgg(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch sequential state-dict → flax params for :class:`VggEncoder`.

    Accepts numpy or torch tensors; weights OIHW → HWIO.
    """
    import numpy as np

    params: Dict[str, Any] = {}
    for idx, name in _TORCH_IDX_TO_NAME.items():
        wkey, bkey = f"{idx}.weight", f"{idx}.bias"
        if wkey not in state_dict:
            continue
        w = np.asarray(state_dict[wkey])
        b = np.asarray(state_dict[bkey])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
