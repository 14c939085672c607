"""Flash-attention Pallas kernel: parity, rectangular shapes, and the
counter-based in-kernel dropout (determinism, tile independence,
exact-mask oracle for fwd AND grads).

All kernel calls run in interpret mode on CPU; the same code path lowers
through Mosaic on TPU (integer hash ops only — no pltpu PRNG primitives).
Reference behavior: torch ``nn.MultiheadAttention(dropout=p)`` applies
dropout to the post-softmax probs (/root/reference/transformer.py:150).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.ops.pallas.flash_attention import (
    attention_reference,
    flash_attention,
    _quantized_keep,
)


def _qkv(key, b, h, sq, sk, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, sq, d), dtype),
            jax.random.normal(kk, (b, h, sk, d), dtype),
            jax.random.normal(kv, (b, h, sk, d), dtype))


def _np_mask(seed, bh_n, sq, sk, thr):
    """Reconstruct the kernel's hash mask on the host — the oracle."""
    def fmix(x):
        x = x.astype(np.uint32)
        x ^= x >> 16
        x = x * np.uint32(0x7FEB352D)
        x ^= x >> 15
        x = x * np.uint32(0x846CA68B)
        x ^= x >> 16
        return x

    row = np.arange(sq, dtype=np.uint32)[:, None]
    col = np.arange(sk, dtype=np.uint32)[None, :]
    out = []
    for bh in range(bh_n):
        salt = np.uint32((seed + bh * 0xC2B2AE35) & 0xFFFFFFFF)
        x = (row * np.uint32(0x9E3779B9)) ^ (col * np.uint32(0x85EBCA6B)) ^ salt
        out.append(fmix(x) >= np.uint32(thr))
    return np.stack(out)


FA = lambda *a, **kw: flash_attention(*a, interpret=True, **kw)


@pytest.mark.parametrize("sq,sk", [(300, 300), (257, 520), (128, 64)])
def test_fwd_parity(sq, sk):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 3, sq, sk, 64)
    sc = 1 / np.sqrt(64)
    o = FA(q, k, v, sm_scale=sc, block_q=128, block_k=128)
    o_ref = attention_reference(q, k, v, sc)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-3


def test_grad_parity_no_dropout():
    q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 200, 310, 64)
    sc = 1 / np.sqrt(64)
    lf = lambda q, k, v: jnp.sum(
        jnp.sin(FA(q, k, v, sm_scale=sc, block_q=128, block_k=128)))
    lr = lambda q, k, v: jnp.sum(jnp.sin(attention_reference(q, k, v, sc)))
    g = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_dropout_deterministic_and_tile_independent():
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 300, 300, 64)
    kw = dict(sm_scale=0.125, dropout_rate=0.25, dropout_seed=7)
    a = FA(q, k, v, block_q=128, block_k=128, **kw)
    b = FA(q, k, v, block_q=128, block_k=128, **kw)
    c = FA(q, k, v, block_q=256, block_k=128, **kw)  # same mask, new tiles
    d = FA(q, k, v, block_q=128, block_k=128, sm_scale=0.125,
           dropout_rate=0.25, dropout_seed=8)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    assert float(jnp.max(jnp.abs(a - c))) == 0.0
    assert float(jnp.max(jnp.abs(a - d))) > 1e-3


def test_dropout_exact_mask_oracle_fwd_and_grad():
    b, h, sq, sk, dd = 1, 2, 300, 180, 64
    q, k, v = _qkv(jax.random.PRNGKey(3), b, h, sq, sk, dd)
    sc, rate, seed = 1 / np.sqrt(dd), 0.25, 7
    thr, keep = _quantized_keep(rate)
    mask = jnp.asarray(
        _np_mask(seed, b * h, sq, sk, thr).reshape(b, h, sq, sk))

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * sc
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(mask, p / keep, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    fa = lambda q, k, v: FA(q, k, v, sm_scale=sc, dropout_rate=rate,
                            dropout_seed=seed, block_q=128, block_k=128)
    assert float(jnp.max(jnp.abs(fa(q, k, v) - ref(q, k, v)))) < 5e-3

    lf = lambda q, k, v: jnp.sum(jnp.cos(1.3 * fa(q, k, v)))
    lr = lambda q, k, v: jnp.sum(jnp.cos(1.3 * ref(q, k, v)))
    g = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a_, b_ in zip(g, gr):
        assert float(jnp.max(jnp.abs(a_ - b_))) < 2e-2


def test_dropout_keep_fraction():
    thr, keep = _quantized_keep(0.1)
    m = _np_mask(0, 4, 512, 512, thr)
    assert abs(m.mean() - keep) < 5e-3


@pytest.mark.parametrize("d", [32, 128])
def test_head_dims(d):
    """d_head other than the production 64 (e.g. d_model 256 / 8 heads)."""
    q, k, v = _qkv(jax.random.PRNGKey(6), 1, 2, 200, 200, d)
    sc = 1 / np.sqrt(d)
    o = FA(q, k, v, sm_scale=sc, block_q=128, block_k=128)
    o_ref = attention_reference(q, k, v, sc)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-3


def test_bf16_path():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 260, 260, 64, jnp.bfloat16)
    sc = 1 / np.sqrt(64)
    o = FA(q, k, v, sm_scale=sc, block_q=128, block_k=128)
    o_ref = attention_reference(q.astype(jnp.float32),
                                k.astype(jnp.float32),
                                v.astype(jnp.float32), sc)
    assert o.dtype == jnp.bfloat16
    assert float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))) < 3e-2


def test_flash_under_shard_map(cpu_mesh8):
    """Flash attention inside shard_map over the batch axis (the
    multi-chip C1 layout: batch data-parallel, no collectives in the
    kernel) equals the unsharded result."""
    from jax.sharding import PartitionSpec as P

    q, k, v = _qkv(jax.random.PRNGKey(0), 8, 2, 256, 256, 64)
    sc = 0.125
    fn = lambda q, k, v: FA(q, k, v, sm_scale=sc, block_q=128, block_k=128)
    single = fn(q, k, v)
    sharded = jax.jit(jax.shard_map(
        fn, mesh=cpu_mesh8,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    ))(q, k, v)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_extreme_logits_stable():
    """Online softmax must stay finite with huge logit magnitudes (the
    running-max rescale, not naive exp) and match the XLA softmax."""
    q, k, v = _qkv(jax.random.PRNGKey(8), 1, 1, 200, 200, 64)
    q = q * 100.0
    o = FA(q, k, v, sm_scale=1.0, block_q=128, block_k=128)
    assert bool(jnp.isfinite(o).all())
    o_ref = attention_reference(q, k, v, 1.0)
    assert float(jnp.max(jnp.abs(o - o_ref))) < 5e-3


def test_requires_seed():
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 128, 128, 64)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, dropout_rate=0.1)


@pytest.mark.slow
def test_styletransformer_flash_matches_xla():
    """Full StyleTransformer fwd: attn_impl='flash' vs 'xla' with shared
    params (deterministic — dropout implementations differ by design)."""
    from tgtc.models.transformer import StyleTransformer, TransformerConfig

    key = jax.random.PRNGKey(0)
    style = jax.random.normal(key, (1, 4, 4, 512))
    content = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 512))
    cfg = dict(num_encoder_layers=1, num_decoder_layers=1,
               dim_feedforward=256)
    m_x = StyleTransformer(TransformerConfig(attn_impl="xla", **cfg))
    m_f = StyleTransformer(TransformerConfig(attn_impl="flash", **cfg))
    params = m_x.init(jax.random.PRNGKey(2), style, content)
    o_x = m_x.apply(params, style, content)
    o_f = m_f.apply(params, style, content)
    assert float(jnp.max(jnp.abs(o_x - o_f))) < 1e-2


@pytest.mark.slow
def test_styletransformer_rectangular_content_style():
    """Content and style grids of DIFFERENT sizes (full-res C3): output
    follows the content grid; flash and xla agree. Regression for the
    output-reshape-by-style-shape bug found in round 3."""
    from tgtc.models.transformer import StyleTransformer, TransformerConfig

    key = jax.random.PRNGKey(0)
    style = jax.random.normal(key, (1, 4, 4, 512))
    content = jax.random.normal(jax.random.fold_in(key, 1), (1, 6, 8, 512))
    cfg = dict(num_encoder_layers=1, num_decoder_layers=1,
               dim_feedforward=256)
    m_x = StyleTransformer(TransformerConfig(attn_impl="xla", **cfg))
    m_f = StyleTransformer(TransformerConfig(attn_impl="flash", **cfg))
    params = m_x.init(jax.random.PRNGKey(2), style, content)
    o_x = m_x.apply(params, style, content)
    o_f = m_f.apply(params, style, content)
    assert o_x.shape == (1, 6, 8, 512)
    assert float(jnp.max(jnp.abs(o_x - o_f))) < 1e-2


@pytest.mark.slow
def test_styletransformer_flash_train_mode_runs():
    """Dropout path end-to-end through flax rngs: grads are finite and the
    same dropout rng gives identical results."""
    from tgtc.models.transformer import StyleTransformer, TransformerConfig

    key = jax.random.PRNGKey(0)
    style = jax.random.normal(key, (1, 4, 4, 512))
    content = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 512))
    m = StyleTransformer(TransformerConfig(
        attn_impl="flash", num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=256))
    params = m.init(jax.random.PRNGKey(2), style, content)

    def loss(p, rng):
        o = m.apply(p, style, content, deterministic=False,
                    rngs={"dropout": rng})
        return jnp.mean(o**2)

    r = jax.random.PRNGKey(9)
    l1, l2 = loss(params, r), loss(params, r)
    l3 = loss(params, jax.random.PRNGKey(10))
    assert l1 == l2 and l1 != l3
    g = jax.grad(loss)(params, r)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
