"""Phase C1 — StyTrans (2D stylization transformer) pretraining.

Rebuild of ``train_transformer`` (/root/reference/trans_train.py:66-216):
content = NeRF renders (Phase-B output), style = style-image directory;
loss = content_weight*loss_c + style_weight*loss_s + 70*l_id1 + 1*l_id2
(:185-187); Adam over **transformer + patch embedding only** (:143-146);
warmup lr ``5e-4*0.1*(1+3e-4*i)`` for 10k iters then decay
``2e-4/(1+1e-5*(i-1e4))`` (:53-64).

TPU-native: the whole loss (5 VGG pyramids + 3 transformer passes) is ONE
jitted, donated step; parameter freezing is an optax mask (zero updates for
vgg/decoder) instead of requires_grad bookkeeping; the reference's
``nn.DataParallel`` (:125-126) becomes batch sharding over the mesh
``data`` axis.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from tgtc.models.stytrans import StyTrans
from tgtc.utils.img import from_uint8, to_uint8
from tgtc.parallel.mesh import data_sharding


@dataclasses.dataclass(frozen=True)
class TransformerTrainConfig:
    lr: float = 5e-4
    lr_decay: float = 1e-5
    max_iter: int = 5000
    batch_size: int = 8
    style_weight: float = 10.0
    content_weight: float = 7.0
    id1_weight: float = 70.0
    id2_weight: float = 1.0
    warmup_iters: int = 10000
    patch: int = 256


def dropout_key(seed: int) -> jax.Array:
    """Dropout key on the hardware RNG (``rbg`` → XLA RngBitGenerator).

    Threefry mask generation is the single biggest cost in a C1 train step
    on TPU — the round-3 bisect measured the full fwd+bwd+Adam at 434 ms
    with threefry dropout vs 67 ms for the same gradient without it (the
    ~20 per-activation mask draws across 3 transformer passes dominate,
    and the compile alone exceeds 10 min). ``rbg`` keys make dropout
    ~free again and compile fast; dropout needs no specific stream, only
    independence. Set ``TGTC_THREEFRY_DROPOUT=1`` for stock threefry keys
    (bit-exact masks across backends/shardings, used by the equality
    dryruns)."""
    impl = ("threefry2x32" if os.environ.get("TGTC_THREEFRY_DROPOUT")
            else "rbg")
    return jax.random.key(seed, impl=impl)


def lr_schedule(cfg: TransformerTrainConfig):
    """Warmup-then-decay (parity /root/reference/trans_train.py:53-64)."""

    def fn(step):
        warm = cfg.lr * 0.1 * (1.0 + 3e-4 * step)
        decay = 2e-4 / (1.0 + cfg.lr_decay * (step - 1e4))
        return jnp.where(step < cfg.warmup_iters, warm, decay)

    return fn


class TransformerTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_transformer_optimizer(
    cfg: TransformerTrainConfig,
    train_keys: Tuple[str, ...] = ("transformer", "embedding"),
) -> optax.GradientTransformation:
    """Adam on the named top-level submodules, frozen elsewhere — the optax
    replacement for the reference's per-module optimizer param lists
    (/root/reference/trans_train.py:143-146) and requires_grad freezing."""

    def labels(params):
        return {
            "params": {
                k: jax.tree.map(
                    lambda _: "train" if k in train_keys else "frozen", v
                )
                for k, v in params["params"].items()
            }
        }

    return optax.multi_transform(
        {"train": optax.adam(lr_schedule(cfg)), "frozen": optax.set_to_zero()},
        param_labels=labels,
    )


def init_transformer_train(
    params: Any, cfg: TransformerTrainConfig,
    train_keys: Tuple[str, ...] = ("transformer", "embedding"),
) -> TransformerTrainState:
    tx = make_transformer_optimizer(cfg, train_keys)
    return TransformerTrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_collage_fn(model: StyTrans):
    """Jitted C1 debug collage — the reference writes a
    content/style/stylized grid every 100 iters
    (/root/reference/trans_train.py:180-183, ``save_image(..., nrow=B)``).
    Returns ``(params, content [B,P,P,3], style) → uint8 [3P, B·P, 3]``:
    row 0 = content batch, row 1 = style batch, row 2 = stylized output."""

    @jax.jit
    def collage(params, content, style):
        content, style = from_uint8(content), from_uint8(style)
        ics, _ = model.apply(params, content, style, method=model.stylize)
        rows = [content, style, ics]
        grid = jnp.concatenate(
            [jnp.concatenate(list(r), axis=1) for r in rows], axis=0
        )
        return to_uint8(grid)

    return collage


def make_transformer_train_step(
    model: StyTrans,
    cfg: TransformerTrainConfig,
    mesh: Optional[Mesh] = None,
    train_keys: Tuple[str, ...] = ("transformer", "embedding"),
    temporal_fn=None,
):
    """Jitted step: ``(state, content [B,P,P,3], style [B,P,P,3], key) →
    (state, metrics)``.

    ``temporal_fn(ics) -> scalar`` optionally adds the Phase-C2 temporal
    term (tgtc.train.temporal wires it) — the same builder serves C1
    (``None``) and C2 (decoder-only ``train_keys`` + temporal)."""
    tx = make_transformer_optimizer(cfg, train_keys)

    def step_fn(state: TransformerTrainState, content, style, key):
        # uint8 batches normalize ON DEVICE (4× fewer host→device bytes;
        # fuses into the first conv)
        content, style = from_uint8(content), from_uint8(style)
        if mesh is not None:
            shard = data_sharding(mesh, 4)
            content = jax.lax.with_sharding_constraint(content, shard)
            style = jax.lax.with_sharding_constraint(style, shard)

        # Differentiate ONLY the trainable submodules: splitting the tree
        # before jax.grad (instead of zeroing frozen grads in optax) means
        # XLA never emits the frozen modules' dW matmuls at all — in C1
        # that skips weight-grads for three full VGG backward passes plus
        # the decoder, a measured 229→~170 ms step-time cut (BASELINE.md
        # round 3). The frozen VGG matches the reference's requires_grad
        # freezing (/root/reference/trans_train.py:143-146).
        train_p = {"params": {k: v for k, v in state.params["params"].items()
                              if k in train_keys}}
        frozen_p = {"params": {k: v for k, v in state.params["params"].items()
                               if k not in train_keys}}

        def loss_fn(tp):
            params = {"params": {**frozen_p["params"], **tp["params"]}}
            out = model.apply(
                params, content, style, False,
                method=model.compute_losses,
                rngs={"dropout": jax.random.fold_in(key, state.step)},
            )
            loss = (
                cfg.content_weight * out["loss_c"]
                + cfg.style_weight * out["loss_s"]
                + cfg.id1_weight * out["l_id1"]
                + cfg.id2_weight * out["l_id2"]
            )
            aux = {k: v for k, v in out.items() if k != "ics"}
            if temporal_fn is not None:
                loss_t = temporal_fn(out["ics"])
                loss = loss + loss_t
                aux["loss_t"] = loss_t
            return loss, aux

        (loss, aux), tgrads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_p
        )
        # frozen leaves get zero-grads so the optimizer tree shape (and the
        # optax multi_transform labels) stay identical to round 2
        grads = {"params": {
            **jax.tree.map(jnp.zeros_like, frozen_p["params"]),
            **tgrads["params"],
        }}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   **{k: v for k, v in aux.items() if jnp.ndim(v) == 0}}
        return (
            TransformerTrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,))
