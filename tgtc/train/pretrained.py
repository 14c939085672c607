"""Wire the reference's pretrained torch assets into the flax param trees.

The reference's entire 2D stack rests on pretrained weights loaded before
Phase C1: ``vgg_normalised.pth`` + ``decoder.pth``
(/root/reference/trans_train.py:112-118, train_style_modules.py:339-344),
optionally a pretrained transformer/embedding pair scanned from
``./pretrained/`` (/root/reference/train_style_modules.py:358-374), a
pretrained ``vae.pth`` (/root/reference/train_style_modules.py:271-274), and
VGG features for VAE training (:276-279). The paths arrive via config
(/root/reference/config.py:22-24).

This module loads those assets (when the files exist) through the tested
converters in :mod:`tgtc.models` and overlays them onto freshly-initialized
parameter trees, logging loudly when an asset is absent and the model falls
back to random initialization — a transformer trained against a frozen
*random* VGG minimizes a meaningless objective.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple


def _load_state_dict(path: str) -> Dict[str, Any]:
    """torch.load a ``.pth`` state dict as plain numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # whole-module saves
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in sd.items()}


def _say(msg: str) -> None:
    print(f"[pretrained] {msg}", flush=True)


def load_vgg_overlay(vgg_pth_path: str) -> Optional[Dict[str, Any]]:
    """``vgg_normalised.pth`` → VggEncoder params subtree, or None."""
    if not vgg_pth_path or not os.path.exists(vgg_pth_path):
        _say(f"VGG weights NOT found at {vgg_pth_path!r} — "
             "falling back to RANDOM VGG (style losses will be meaningless)")
        return None
    from tgtc.models.vgg import convert_torch_vgg

    _say(f"loading pretrained VGG from {vgg_pth_path}")
    return convert_torch_vgg(_load_state_dict(vgg_pth_path))["params"]


def load_decoder_overlay(decoder_pth_path: str) -> Optional[Dict[str, Any]]:
    """``decoder.pth`` → Decoder params subtree, or None."""
    if not decoder_pth_path or not os.path.exists(decoder_pth_path):
        _say(f"decoder weights NOT found at {decoder_pth_path!r} — "
             "falling back to RANDOM decoder")
        return None
    from tgtc.models.decoder import convert_torch_decoder

    _say(f"loading pretrained decoder from {decoder_pth_path}")
    return convert_torch_decoder(_load_state_dict(decoder_pth_path))["params"]


def _latest_with(substr: str, d: str) -> Optional[str]:
    """Reference-style discovery: newest ``sorted(os.listdir)`` entry whose
    name contains ``substr`` (/root/reference/train_style_modules.py:359)."""
    if not d or not os.path.isdir(d):
        return None
    hits = [f for f in sorted(os.listdir(d))
            if substr in f and f.endswith(".pth")]
    return os.path.join(d, hits[-1]) if hits else None


def _filter_to(init_subtree: Any, overlay: Any) -> Any:
    """Keep only overlay keys that exist in the init tree — e.g. the full
    vgg_normalised.pth carries conv4_2..conv5_1, which the (reference-parity)
    truncated VggEncoder never instantiates."""
    if not isinstance(init_subtree, dict) or not isinstance(overlay, dict):
        return overlay
    return {k: _filter_to(init_subtree[k], v) for k, v in overlay.items()
            if k in init_subtree}


def _shapes_compatible(init_subtree: Any, overlay: Any, what: str) -> bool:
    """An overlay may only replace a subtree whose leaf shapes it matches —
    e.g. the reference 512-ch decoder cannot load into a small-d_model test
    config. Mismatches are skipped loudly rather than crashing at apply."""
    import jax

    try:
        ia, ib = jax.tree.leaves(init_subtree), jax.tree.leaves(overlay)
        if len(ia) != len(ib):
            raise ValueError(f"{len(ia)} vs {len(ib)} leaves")
        for a, b in zip(ia, ib):
            if a.shape != b.shape:
                raise ValueError(f"{a.shape} vs {b.shape}")
    except ValueError as e:
        _say(f"{what} weights do NOT fit the configured model ({e}) — "
             "keeping random init")
        return False
    return True


def overlay_stytrans_params(
    params: Any,
    vgg_pth_path: str = "",
    decoder_pth_path: str = "",
    pretrained_dir: str = "",
) -> Tuple[Any, Dict[str, bool]]:
    """Overlay pretrained VGG / decoder (and, if a ``pretrained_dir``
    carries reference ``transformer*/embedding*`` pths, those too) onto a
    freshly initialized StyTrans param tree.

    Returns (params, {asset: loaded?}). Mirrors the reference's load order
    at /root/reference/trans_train.py:112-118 and
    /root/reference/train_style_modules.py:339-374.
    """
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else \
        dict(params)
    inner = dict(tree["params"])
    loaded = {"vgg": False, "decoder": False,
              "transformer": False, "embedding": False}

    vgg = load_vgg_overlay(vgg_pth_path)
    if vgg is not None:
        vgg = _filter_to(inner["vgg"], vgg)
    if vgg is not None and _shapes_compatible(inner["vgg"], vgg, "VGG"):
        inner["vgg"] = vgg
        loaded["vgg"] = True
    dec = load_decoder_overlay(decoder_pth_path)
    if dec is not None and _shapes_compatible(inner["decode"], dec, "decoder"):
        inner["decode"] = dec
        loaded["decoder"] = True

    tpth = _latest_with("transformer", pretrained_dir)
    if tpth:
        from tgtc.models.torch_compat import convert_torch_transformer

        _say(f"loading pretrained transformer from {tpth}")
        t = convert_torch_transformer(_load_state_dict(tpth))["params"]
        if _shapes_compatible(inner["transformer"], t, "transformer"):
            inner["transformer"] = t
            loaded["transformer"] = True
    epth = _latest_with("embedding", pretrained_dir)
    if epth:
        from tgtc.models.torch_compat import convert_torch_patch_embed

        _say(f"loading pretrained patch embedding from {epth}")
        e = convert_torch_patch_embed(_load_state_dict(epth))["params"]
        if _shapes_compatible(inner["embedding"], e, "embedding"):
            inner["embedding"] = e
            loaded["embedding"] = True

    tree["params"] = inner
    return tree, loaded


def load_vae_params(vae_pth_path: str, depth: int = 4) -> Optional[Any]:
    """``vae.pth`` → Vae params, or None (reference loads it when present,
    /root/reference/train_style_modules.py:271-274)."""
    if not vae_pth_path or not os.path.exists(vae_pth_path):
        return None
    from tgtc.models.torch_compat import convert_torch_vae

    _say(f"loading pretrained VAE from {vae_pth_path}")
    return convert_torch_vae(_load_state_dict(vae_pth_path), depth=depth)
