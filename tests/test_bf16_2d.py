"""Mixed-precision (bf16 compute) 2D stack: same param tree as f32, and
loss values close enough that training dynamics are preserved.

The TPU pipeline builds StyTrans with dtype=bfloat16
(tgtc/train/pipeline.py); parity tests and CPU runs stay f32. These tests
pin (a) checkpoint compatibility — the param pytree must be identical so
torch converters and orbax checkpoints work for both dtypes — and (b)
numeric sanity of the bf16 losses against f32 on the SAME params.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.stytrans import make_stytrans
from tgtc.models.transformer import TransformerConfig
import pytest

CFG_F32 = TransformerConfig(d_model=32, nhead=2, num_encoder_layers=1,
                            num_decoder_layers=1, dim_feedforward=32,
                            dropout=0.0, dtype=jnp.float32)
CFG_BF16 = TransformerConfig(d_model=32, nhead=2, num_encoder_layers=1,
                             num_decoder_layers=1, dim_feedforward=32,
                             dropout=0.0, dtype=jnp.bfloat16)


@pytest.mark.slow
def test_param_tree_identical_across_dtypes():
    m32, p32 = make_stytrans(jax.random.PRNGKey(0), CFG_F32, image_size=32)
    m16, p16 = make_stytrans(jax.random.PRNGKey(0), CFG_BF16, image_size=32)
    assert jax.tree_util.tree_structure(p32) == jax.tree_util.tree_structure(p16)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        assert a.shape == b.shape
        assert a.dtype == b.dtype == jnp.float32  # params stay f32


@pytest.mark.slow
def test_bf16_losses_match_f32():
    key = jax.random.PRNGKey(1)
    m32, params = make_stytrans(jax.random.PRNGKey(0), CFG_F32, image_size=32)
    m16 = type(m32)(CFG_BF16)

    content = jax.random.uniform(key, (2, 32, 32, 3))
    style = jax.random.uniform(jax.random.fold_in(key, 1), (2, 32, 32, 3))

    o32 = m32.apply(params, content, style, True,
                    method=m32.compute_losses)
    o16 = m16.apply(params, content, style, True,
                    method=m16.compute_losses)

    assert o16["ics"].dtype == jnp.float32  # outputs cast back
    for name in ("loss_c", "loss_s", "l_id1", "l_id2"):
        a, b = float(o32[name]), float(o16[name])
        assert np.isfinite(b), name
        # bf16 matmuls with f32 params/stats: a few percent on random init
        assert abs(a - b) <= 0.08 * max(abs(a), abs(b), 1e-3), (name, a, b)


@pytest.mark.slow
def test_bf16_gradients_flow_and_are_finite():
    import optax

    from tgtc.train.transformer2d import (
        TransformerTrainConfig, init_transformer_train,
        make_transformer_train_step,
    )

    m16, params = make_stytrans(jax.random.PRNGKey(0), CFG_BF16,
                                image_size=32)
    tcfg = TransformerTrainConfig(batch_size=2, patch=32)
    state = init_transformer_train(params, tcfg)
    step = make_transformer_train_step(m16, tcfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    state, m = step(state, x, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    # trained submodules actually moved
    before = make_stytrans(jax.random.PRNGKey(0), CFG_BF16, image_size=32)[1]
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["params"]["transformer"],
        before["params"]["transformer"],
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_bf16_attention_dropout_u8_statistics():
    """The bf16 attention path draws its probs-dropout mask from uint8
    hardware-RNG bits (keep-prob quantized to 1/256, scale uses the exact
    quantized value). Check: output mean is preserved (unbiasedness) and
    the drop fraction matches the quantized rate."""
    from tgtc.models.transformer import MultiHeadAttention

    rate = 0.1
    mha = MultiHeadAttention(32, 2, rate, jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 64, 32))
    params = mha.init({"params": key}, x, x, x, True)

    det = mha.apply(params, x, x, x, True)
    runs = [
        np.asarray(
            mha.apply(params, x, x, x, False,
                      rngs={"dropout": jax.random.PRNGKey(100 + i)}),
            np.float32,
        )
        for i in range(8)
    ]
    avg = np.mean(runs, axis=0)
    # dropout-averaged output approaches the deterministic one
    assert np.mean(np.abs(avg - np.asarray(det, np.float32))) < 0.05
    # and individual runs genuinely differ (dropout is live)
    assert np.max(np.abs(runs[0] - runs[1])) > 1e-3


def test_dropout_key_impls():
    import os

    from tgtc.train.transformer2d import dropout_key

    k = dropout_key(7)
    assert jax.random.bits(k, (4,), jnp.uint32).shape == (4,)
    os.environ["TGTC_THREEFRY_DROPOUT"] = "1"
    try:
        k2 = dropout_key(7)
        ref = jax.random.PRNGKey(7)
        assert np.array_equal(
            jax.random.key_data(k2), np.asarray(ref))
    finally:
        del os.environ["TGTC_THREEFRY_DROPOUT"]
