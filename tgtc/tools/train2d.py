"""Standalone 2D-stage trainer CLI.

Parity with the reference's standalone scripts: ``train_style_modules.py``'s
``__main__`` (task = vae / finetune_decoder / temporal_decoder,
/root/reference/train_style_modules.py:689-735) and ``trans_train.py``'s
``train_transformer`` entry (/root/reference/trans_train.py:66-82). Flag
names and defaults match the reference argparse 1:1 so a reference user's
tuning commands port verbatim::

    python -m tgtc.tools.train2d --task vae --style_dir ./all_styles \
        --vae_latent 32 --max_iter 4000
    python -m tgtc.tools.train2d --task finetune_decoder \
        --content_dir ./all_contents --style_dir ./all_styles
    python -m tgtc.tools.train2d --task temporal_decoder \
        --nerf_content_dir ./nerf_gen_data2 --style_dir ./all_styles
    python -m tgtc.tools.train2d --task transformer \
        --nerf_content_dir ./nerf_gen_data2 --style_dir ./all_styles

Inside the pipeline these stages run as phases C1/C2/D with the
reference-orchestrator's hardcoded hyperparameters
(/root/reference/train_style_modules.py:309-319); this tool is the knobbed
standalone path.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def _list_images(d: str) -> List[str]:
    exts = (".jpg", ".jpeg", ".png", ".JPG", ".PNG", ".JPEG")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(exts)
    )


def _content_images(d: str) -> List[str]:
    """NeRF-render content images: drop the Phase-B depth/geometry dumps.
    Filter on the BASENAME — a parent directory containing 'depth' or
    'geometry' must not exclude everything (the reference filters filenames,
    /root/reference/train_style_modules.py:87-90)."""
    return [p for p in _list_images(d)
            if "depth" not in os.path.basename(p)
            and "geometry" not in os.path.basename(p)]


def build_parser() -> argparse.ArgumentParser:
    # names/defaults: /root/reference/train_style_modules.py:691-727
    p = argparse.ArgumentParser(prog="tgtc.tools.train2d")
    p.add_argument("--task", type=str, default="vae",
                   choices=["vae", "finetune_decoder", "temporal_decoder",
                            "transformer"])
    p.add_argument("--content_dir", type=str, default="./all_contents/")
    p.add_argument("--nerf_content_dir", type=str, default="./nerf_gen_data2/")
    p.add_argument("--style_dir", type=str, default="./all_styles/")
    p.add_argument("--vgg", type=str, default="./pretrained/vgg_normalised.pth")
    p.add_argument("--decoder", type=str, default="./pretrained/decoder.pth")
    p.add_argument("--no_ndc", action="store_true")
    p.add_argument("--no_reload", action="store_true")
    p.add_argument("--save_dir", default="./pretrained/")
    p.add_argument("--ckp_num", type=int, default=3)
    p.add_argument("--log_dir", default="./logs/stylenet/")
    # Shared flags whose REFERENCE DEFAULTS DIFFER PER TASK
    # (train_style_modules.py:700-712 vs trans_train.py:72-79) parse as
    # None sentinels and are resolved per task in _resolve_task_defaults —
    # so an explicit value equal to one script's default is always honored.
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr_decay", type=float, default=None)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--style_weight", type=float, default=None)
    p.add_argument("--content_weight", type=float, default=None)
    p.add_argument("--temporal_weight", type=float, default=50.0)
    p.add_argument("--n_threads", type=int, default=16)
    p.add_argument("--save_model_interval", type=int, default=None)
    p.add_argument("--print_interval", type=int, default=20)
    # patch size of the random crops (the reference's train_transform
    # crops 256, /root/reference/trans_train.py:31-38)
    p.add_argument("--patch", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    # declared in trans_train.train_transformer but DEAD IN THE REFERENCE
    # ITSELF (/root/reference/trans_train.py:80-81; transformer.py never
    # reads them). position_embedding is parse-and-ignore like the other
    # dead flags (DESIGN.md); hidden_dim is FUNCTIONAL here (transformer
    # width), like steps_per_opt/num_workers in the main config.
    p.add_argument("--position_embedding", type=str, default="sine")
    p.add_argument("--hidden_dim", type=int, default=512)
    # train vae options (/root/reference/train_style_modules.py:723-727)
    p.add_argument("--vae_d", type=int, default=4)
    p.add_argument("--vae_w", type=int, default=512)
    p.add_argument("--vae_latent", type=int, default=32)
    p.add_argument("--vae_kl_lambda", type=float, default=0.1)
    return p


# reference defaults per task: train_style_modules.py:700-712 for the
# vae/decoder script, trans_train.py:72-79 for train_transformer
_TASK_DEFAULTS = {
    "vae": dict(lr=1e-4, lr_decay=5e-5, max_iter=160000, style_weight=2.0,
                content_weight=1.0, save_model_interval=200),
    "finetune_decoder": dict(lr=1e-4, lr_decay=5e-5, max_iter=160000,
                             style_weight=2.0, content_weight=1.0,
                             save_model_interval=200),
    "temporal_decoder": dict(lr=1e-4, lr_decay=5e-5, max_iter=160000,
                             style_weight=2.0, content_weight=1.0,
                             save_model_interval=200),
    "transformer": dict(lr=5e-4, lr_decay=1e-5, max_iter=5000,
                        style_weight=10.0, content_weight=7.0,
                        save_model_interval=1000),
}


def _resolve_task_defaults(args) -> None:
    """Fill the None-sentinel shared flags with the task's reference
    defaults; explicitly passed values (even if equal to another task's
    default) win."""
    for k, v in _TASK_DEFAULTS[args.task].items():
        if getattr(args, k) is None:
            setattr(args, k, v)


def _ckpt(args, name: str):
    from tgtc.train.checkpoint import CheckpointManager

    return CheckpointManager(os.path.join(args.save_dir, name),
                             max_to_keep=args.ckp_num)


def _logger(args, name: str):
    from tgtc.utils.logging import MetricsLogger

    os.makedirs(args.log_dir, exist_ok=True)
    return MetricsLogger(args.log_dir, name=name)


def _vgg_with_overlay(args, image_size: int):
    import jax

    from tgtc.models.vgg import make_vgg
    from tgtc.train.pretrained import _filter_to, load_vgg_overlay

    vgg, vgg_params = make_vgg(jax.random.PRNGKey(0), image_size=image_size)
    overlay = load_vgg_overlay(args.vgg)
    if overlay is not None:
        vgg_params = {"params": _filter_to(vgg_params["params"], overlay)}
    return vgg, vgg_params


def run_vae(args) -> int:
    """Reference ``train_vae`` (/root/reference/train_style_modules.py:249-303):
    VGG relu4_1 [mean ‖ std] features of style crops → VAE recon + KL."""
    import jax
    import jax.numpy as jnp

    from tgtc.data.prefetch import CropBatchPrefetcher
    from tgtc.models.vae import VaeConfig
    from tgtc.train.vae_trainer import (
        VaeTrainConfig, init_vae_train, make_vae_train_step,
        vgg_style_feature,
    )
    from tgtc.utils.img import from_uint8

    vcfg = VaeConfig(data_dim=1024, latent_dim=args.vae_latent,
                     width=args.vae_w, depth=args.vae_d,
                     kl_lambda=args.vae_kl_lambda)
    tcfg = VaeTrainConfig(lr=args.lr, lr_decay=args.lr_decay,
                          max_iter=args.max_iter,
                          batch_size=args.batch_size,
                          kl_lambda=args.vae_kl_lambda)
    model, state = init_vae_train(jax.random.PRNGKey(args.seed), vcfg, tcfg)
    ckpt = _ckpt(args, "vae")
    if not args.no_reload and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    log = _logger(args, "vae")
    vgg, vgg_params = _vgg_with_overlay(args, image_size=64)
    feat_fn = jax.jit(
        lambda imgs: vgg_style_feature(vgg, vgg_params, from_uint8(imgs)))
    step_fn = make_vae_train_step(model, tcfg)
    key = jax.random.PRNGKey(args.seed + 1)
    paths = _list_images(args.style_dir)
    assert paths, f"no images in {args.style_dir}"
    with CropBatchPrefetcher(paths, tcfg.batch_size, args.patch,
                             resize=2 * args.patch, seed=args.seed,
                             workers=min(args.n_threads, 8)) as pf:
        step = int(state.step)
        while step < tcfg.max_iter:
            x = feat_fn(jnp.asarray(pf.next()))
            state, m = step_fn(state, x, key)
            step += 1
            if step % args.print_interval == 0:
                log.log(step, m, prefix="VAE")
            if step % args.save_model_interval == 0 or step >= tcfg.max_iter:
                ckpt.save(step, jax.device_get(state),
                          wait=step >= tcfg.max_iter)
    return 0


def _adain_setup(args, image_size: int):
    import jax

    from tgtc.models.adain_net import make_adain_net
    from tgtc.train.adain_trainer import AdainTrainConfig, init_adain_train
    from tgtc.train.pretrained import (
        _filter_to, load_decoder_overlay, load_vgg_overlay,
    )

    model, params = make_adain_net(jax.random.PRNGKey(args.seed),
                                   image_size=image_size)
    # the reference loads decoder.pth + vgg_normalised.pth before the
    # finetune (/root/reference/train_style_modules.py:195-202)
    vgg_overlay = load_vgg_overlay(args.vgg)
    if vgg_overlay is not None:
        params["params"]["vgg"] = _filter_to(params["params"]["vgg"],
                                             vgg_overlay)
    dec_overlay = load_decoder_overlay(args.decoder)
    if dec_overlay is not None:
        params["params"]["decode"] = _filter_to(params["params"]["decode"],
                                                dec_overlay)
    cfg = AdainTrainConfig(lr=args.lr, lr_decay=args.lr_decay,
                           content_weight=args.content_weight,
                           style_weight=args.style_weight,
                           temporal_weight=args.temporal_weight,
                           max_iter=args.max_iter)
    return model, init_adain_train(params, cfg), cfg


def run_finetune_decoder(args) -> int:
    """Reference ``finetune_decoder``
    (/root/reference/train_style_modules.py:187-246): decoder-only AdaIN
    training on content/style crops."""
    import jax
    import jax.numpy as jnp

    from tgtc.data.prefetch import CropBatchPrefetcher
    from tgtc.train.adain_trainer import make_adain_finetune_step
    from tgtc.utils.img import from_uint8

    model, state, cfg = _adain_setup(args, image_size=args.patch)
    step_fn = make_adain_finetune_step(model, cfg)
    ckpt = _ckpt(args, "adain_decoder")
    if not args.no_reload and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    log = _logger(args, "finetune_decoder")
    c_paths = _list_images(args.content_dir)
    s_paths = _list_images(args.style_dir)
    assert c_paths and s_paths
    workers = min(args.n_threads, 8)
    with CropBatchPrefetcher(c_paths, args.batch_size, args.patch,
                             seed=args.seed, workers=workers) as cpf, \
         CropBatchPrefetcher(s_paths, args.batch_size, args.patch,
                             seed=args.seed + 1, workers=workers) as spf:
        step = int(state.step)
        while step < cfg.max_iter:
            content = from_uint8(jnp.asarray(cpf.next()))
            style = from_uint8(jnp.asarray(spf.next()))
            state, m = step_fn(state, content, style)
            step += 1
            if step % args.print_interval == 0:
                log.log(step, m, prefix="ADAIN FT")
            if step % args.save_model_interval == 0 or step >= cfg.max_iter:
                ckpt.save(step, jax.device_get(state),
                          wait=step >= cfg.max_iter)
    return 0


def run_temporal_decoder(args) -> int:
    """Reference ``train_temporal_decoder``
    (/root/reference/train_style_modules.py:545-685): AdaIN losses + the
    point-splat temporal term over a NeRF geometry dump
    (``nerf_content_dir`` must hold the renders + ``geometry.npz`` that
    phase B / ``tgtc.train.geometry`` writes)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tgtc.ops.rasterize import llff_projection_matrix
    from tgtc.train.adain_trainer import make_adain_temporal_step

    geo = np.load(os.path.join(args.nerf_content_dir, "geometry.npz"))
    coor_maps, cps = geo["coor_maps"], geo["cps"]
    c_paths = _content_images(args.nerf_content_dir)
    assert len(c_paths) == coor_maps.shape[0] == cps.shape[0], (
        f"{args.nerf_content_dir}: {len(c_paths)} render images but "
        f"geometry.npz has {coor_maps.shape[0]} coor_maps / "
        f"{cps.shape[0]} poses — extra/missing PNGs would misalign frames "
        "with their geometry"
    )
    renders = np.stack(
        [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
         for p in c_paths], 0)
    h, w = renders.shape[1:3]
    focal = float(geo["hwf"][2]) if "hwf" in geo else float(max(h, w))
    proj = jnp.asarray(llff_projection_matrix(h, w, focal))
    model, state, cfg = _adain_setup(args, image_size=min(h, w, args.patch))
    step_fn = make_adain_temporal_step(model, cfg, proj, h, w,
                                       is_ndc=not args.no_ndc, focal=focal)
    ckpt = _ckpt(args, "adain_temporal")
    if not args.no_reload and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    log = _logger(args, "temporal_decoder")
    s_paths = _list_images(args.style_dir)
    styles = np.stack(
        [np.asarray(
            Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR),
            np.float32) / 255.0 for p in s_paths], 0)
    rng = np.random.default_rng(args.seed)
    step = int(state.step)
    while step < cfg.max_iter:
        ids = rng.integers(0, renders.shape[0], args.batch_size)
        s_id = int(rng.integers(0, styles.shape[0]))
        style = jnp.asarray(np.broadcast_to(
            styles[s_id, None], (args.batch_size, h, w, 3)).copy())
        state, m = step_fn(state, jnp.asarray(renders[ids]),
                           jnp.asarray(coor_maps[ids]),
                           jnp.asarray(cps[ids]), style)
        step += 1
        if step % args.print_interval == 0:
            log.log(step, m, prefix="ADAIN TEMPORAL")
        if step % args.save_model_interval == 0 or step >= cfg.max_iter:
            ckpt.save(step, jax.device_get(state), wait=step >= cfg.max_iter)
    return 0


def run_transformer(args) -> int:
    """Reference ``trans_train.train_transformer``
    (/root/reference/trans_train.py:66-201): StyTrans pretrain on
    content/style crops with the 4-term loss; writes the content/style/
    stylized collage every 100 iters into ``log_dir`` like the reference's
    ``save_dir/test`` dumps (/root/reference/trans_train.py:180-183)."""
    import jax
    import jax.numpy as jnp

    from tgtc.data.prefetch import CropBatchPrefetcher
    from tgtc.models.stytrans import make_stytrans
    from tgtc.models.transformer import TransformerConfig
    from tgtc.train.pretrained import overlay_stytrans_params
    from tgtc.train.transformer2d import (
        TransformerTrainConfig, dropout_key, init_transformer_train,
        make_collage_fn, make_transformer_train_step,
    )
    from tgtc.utils import native

    # trans_train defaults (lr=5e-4, lr_decay=1e-5, max_iter=5000,
    # style 10 / content 7, save every 1000 — /root/reference/
    # trans_train.py:72-79) arrive via _resolve_task_defaults; explicit
    # flags are always honored.
    tcfg = TransformerTrainConfig(
        lr=args.lr, lr_decay=args.lr_decay, max_iter=args.max_iter,
        batch_size=args.batch_size, style_weight=args.style_weight,
        content_weight=args.content_weight, patch=args.patch,
    )
    # same backend-aware choices as the pipeline: flash attention + bf16
    # on TPU, XLA einsum + f32 elsewhere (tgtc/train/pipeline.py)
    mcfg = TransformerConfig(
        d_model=args.hidden_dim,
        dtype=jnp.bfloat16 if jax.default_backend() != "cpu"
        else jnp.float32,
        attn_impl="flash" if jax.default_backend() == "tpu" else "xla",
    )
    model, params = make_stytrans(
        jax.random.PRNGKey(args.seed), mcfg, image_size=32)
    params, _ = overlay_stytrans_params(
        params, vgg_pth_path=args.vgg, decoder_pth_path=args.decoder,
        pretrained_dir=os.path.dirname(args.vgg or ""),
    )
    state = init_transformer_train(params, tcfg)
    ckpt = _ckpt(args, "transformer")
    if not args.no_reload and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    log = _logger(args, "transformer")
    collage_fn = make_collage_fn(model)
    key = dropout_key(args.seed + 3)
    step_fn = make_transformer_train_step(model, tcfg)
    c_paths = _content_images(args.nerf_content_dir)
    s_paths = _list_images(args.style_dir)
    assert c_paths and s_paths
    workers = min(args.n_threads, 8)
    with CropBatchPrefetcher(c_paths, tcfg.batch_size, tcfg.patch,
                             seed=args.seed, workers=workers) as cpf, \
         CropBatchPrefetcher(s_paths, tcfg.batch_size, tcfg.patch,
                             seed=args.seed + 1, workers=workers) as spf:
        step = int(state.step)
        while step < tcfg.max_iter:
            content = jnp.asarray(cpf.next())
            style = jnp.asarray(spf.next())
            state, m = step_fn(state, content, style, key)
            step += 1
            if step % args.print_interval == 0:
                log.log(step, m, prefix="TRANS TRAIN")
            if step % 100 == 0 or step >= tcfg.max_iter:
                native.write_png_async(
                    os.path.join(args.log_dir, f"{step}.png"),
                    np.asarray(collage_fn(state.params, content, style)))
            if step % args.save_model_interval == 0 or step >= tcfg.max_iter:
                ckpt.save(step, jax.device_get(state),
                          wait=step >= tcfg.max_iter)
    native.wait_writes()
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    _resolve_task_defaults(args)
    os.makedirs(args.save_dir, exist_ok=True)
    return {
        "vae": run_vae,
        "finetune_decoder": run_finetune_decoder,
        "temporal_decoder": run_temporal_decoder,
        "transformer": run_transformer,
    }[args.task](args)


if __name__ == "__main__":
    raise SystemExit(main())
