"""Fused (flash) attention Pallas kernel with in-kernel counter-based dropout.

Why: the StyTrans transformer (tgtc.models.transformer) runs 27 attention
sites per C1 train step at S=1024 (and S≈12k for full-resolution C3
stylization). The XLA path materializes the [B,H,Sq,Sk] logits/probs in
HBM — at S=1024 that is ~134 MB bf16 per site and the round-3 op-profile
put this S² traffic plus the d_head=64 layout transposes at ~90-100 ms of
the 202 ms step; at S≈12k a single materialized probs tensor is >2 GB.
This kernel streams K/V blocks through VMEM with an online softmax, so HBM
traffic collapses to reading q/k/v and writing o (+ a [B,H,Sq] logsumexp).

Supports rectangular attention (Sq != Sk) — the decoder cross-attends
content tokens to style memory of a different length.

Attention-probs dropout (torch ``nn.MultiheadAttention(dropout=p)`` parity,
/root/reference/transformer.py:150) happens INSIDE the kernel via a
counter-based hash PRNG: every logical element (bh, q-row, k-col) hashes
its own coordinates + the user seed through a murmur3-style finalizer
(integer VPU ops — runs identically under Mosaic and interpret mode), so
the mask never touches HBM — and the backward kernels REGENERATE the
identical mask by hashing the same coordinates (the standard
counter-based-dropout trick; identity is by construction since the mask
is a pure function of element coordinates, independent of tile shape).
Keep-probability is quantized to 1/2^32 and the rescale uses the exact
quantized value, so E[probs] is unbiased.

Backward math (non-causal flash, with dropout M/keep):
    O = (P ⊙ M / keep) V,   P = softmax(S),   L = logsumexp rows of S
    Δ_i = Σ_d dO_id · O_id          (equals rowsum(P̃ ⊙ dP̃), dropout-safe)
    dP̃ = dO Vᵀ ;  dP = dP̃ ⊙ M / keep ;  dS = P ⊙ (dP − Δ)
    dQ_i = Σ_j dS_ij K_j ;  dK_j = Σ_i dS_ij Q_i ;  dV_j = Σ_i P̃_ij dO_i

Layout notes (v5e): d_head=64 rides the lanes half-packed — acceptable
because all S²-sized tiles live in VMEM only. K/V for one (b,h) are kept
whole in VMEM (Sk≤~24k at D=64 bf16 within the 16 MB budget); q is
blocked. bf16 matmuls with f32 accumulation; softmax/exp statistics f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _quantized_keep(rate: float) -> Tuple[int, float]:
    """(uint32 threshold, exact keep probability). An element is DROPPED
    when its uint32 draw is < threshold."""
    thr = int(round(rate * float(2**32)))
    thr = max(0, min(thr, 2**32 - 1))
    return thr, 1.0 - thr / float(2**32)


def _dropout_mask(seed_ref, bh, q0, k0, shape, thr: int):
    """Keep-mask for the tile whose top-left logical element is
    (q-row q0, k-col k0) of batch·head ``bh``. Pure function of
    (seed, bh, absolute row, absolute col) — fwd and both bwd kernels
    regenerate identical masks regardless of their tile shapes."""
    row = (q0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)).astype(
        jnp.uint32)
    col = (k0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)).astype(
        jnp.uint32)
    x = (row * jnp.uint32(0x9E3779B9)
         ^ col * jnp.uint32(0x85EBCA6B)
         ^ (seed_ref[0].astype(jnp.uint32)
            + jnp.asarray(bh).astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)))
    # murmur3 fmix32 — full avalanche so adjacent counters decorrelate
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x >= jnp.uint32(thr)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, n_k, block_k, sk_real, rate, thr, keep):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0]                                  # [BQ, D]
    bq = q.shape[0]

    def body(ki, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kidx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(kidx < sk_real, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            mask = _dropout_mask(seed_ref, bh, qi * bq, ki * block_k,
                                 (bq, block_k), thr)
            p = jnp.where(mask, p * (1.0 / keep), 0.0)
        vb = v_ref[0, pl.ds(ki * block_k, block_k), :]
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, q_ref.shape[-1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, n_k, block_k, sk_real, rate, thr, keep):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    bq = q.shape[0]

    def body(ki, dq_acc):
        kb = k_ref[0, pl.ds(ki * block_k, block_k), :]
        vb = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kidx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(kidx < sk_real, s, NEG_INF)
        p = jnp.exp(s - lse)
        dpt = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            mask = _dropout_mask(seed_ref, bh, qi * bq, ki * block_k,
                                 (bq, block_k), thr)
            dpt = jnp.where(mask, dpt * (1.0 / keep), 0.0)
        ds = p * (dpt - delta)
        return dq_acc + jax.lax.dot_general(
            ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((bq, q_ref.shape[-1]), jnp.float32)
    dq_ref[0] = jax.lax.fori_loop(0, n_k, body, dq0).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, n_q, block_q, sq_real, sk_real, rate,
                thr, keep):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    kb = k_ref[0]                                  # [BK, D]
    vb = v_ref[0]
    bk = kb.shape[0]
    kidx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)

    def body(qi, carry):
        dk_acc, dv_acc = carry
        qb = q_ref[0, pl.ds(qi * block_q, block_q), :]
        dob = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lseb = lse_ref[0, pl.ds(qi * block_q, block_q), :]
        deltab = delta_ref[0, pl.ds(qi * block_q, block_q), :]
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask padded keys (this k block may hold them) and padded q rows
        qidx = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        s = jnp.where((kidx < sk_real) & (qidx < sq_real), s, NEG_INF)
        p = jnp.exp(s - lseb)
        p = jnp.where(qidx < sq_real, p, 0.0)
        pd = p
        dpt = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            mask = _dropout_mask(seed_ref, bh, qi * block_q, ki * bk,
                                 (block_q, bk), thr)
            pd = jnp.where(mask, p * (1.0 / keep), 0.0)
            dpt = jnp.where(mask, dpt * (1.0 / keep), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            pd.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dpt - deltab)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((bk, kb.shape[-1]), jnp.float32)
    dv0 = jnp.zeros((bk, vb.shape[-1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_seq(x: jnp.ndarray, sp: int) -> jnp.ndarray:
    s = x.shape[1]
    if s == sp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, sp - s)
    return jnp.pad(x, pad)


def _block_pad(s: int, block: int) -> Tuple[int, int]:
    """(block size clipped to the padded length, padded length)."""
    b = min(block, _round_up(s, 128))
    return b, _round_up(s, b)


def _fwd_call(q3, k3, v3, seed_arr, rate, block_q, block_k, sk_real,
              interpret):
    bh_n, spq, d = q3.shape
    spk = k3.shape[1]
    n_q = spq // block_q
    n_k = spk // block_k
    thr, keep = _quantized_keep(rate)
    kernel = functools.partial(
        _fwd_kernel, n_k=n_k, block_k=block_k, sk_real=sk_real,
        rate=rate, thr=thr, keep=keep)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_n, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, s: (bh, qi, 0)),
                pl.BlockSpec((1, spk, d), lambda bh, qi, s: (bh, 0, 0)),
                pl.BlockSpec((1, spk, d), lambda bh, qi, s: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, s: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, qi, s: (bh, qi, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh_n, spq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh_n, spq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, q3, k3, v3)


def _bwd_call(q3, k3, v3, do3, lse3, delta3, seed_arr, rate,
              block_q, block_k, sq_real, sk_real, interpret):
    bh_n, spq, d = q3.shape
    spk = k3.shape[1]
    n_q = spq // block_q
    n_k = spk // block_k
    thr, keep = _quantized_keep(rate)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_k=n_k, block_k=block_k,
                          sk_real=sk_real, rate=rate, thr=thr, keep=keep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_n, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, s: (bh, qi, 0)),
                pl.BlockSpec((1, spk, d), lambda bh, qi, s: (bh, 0, 0)),
                pl.BlockSpec((1, spk, d), lambda bh, qi, s: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda bh, qi, s: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, qi, s: (bh, qi, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, qi, s: (bh, qi, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda bh, qi, s: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh_n, spq, d), q3.dtype),
        interpret=interpret,
    )(seed_arr, q3, k3, v3, do3, lse3, delta3)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_q=n_q, block_q=block_q,
                          sq_real=sq_real, sk_real=sk_real, rate=rate,
                          thr=thr, keep=keep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_n, n_k),
            in_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, ki, s: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ki, s: (bh, ki, 0)),
                pl.BlockSpec((1, spq, d), lambda bh, ki, s: (bh, 0, 0)),
                pl.BlockSpec((1, spq, d), lambda bh, ki, s: (bh, 0, 0)),
                pl.BlockSpec((1, spq, 1), lambda bh, ki, s: (bh, 0, 0)),
                pl.BlockSpec((1, spq, 1), lambda bh, ki, s: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, ki, s: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ki, s: (bh, ki, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh_n, spk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh_n, spk, d), v3.dtype),
        ],
        interpret=interpret,
    )(seed_arr, k3, v3, q3, do3, lse3, delta3)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, seed_arr, sm_scale, rate, block_q, block_k, interpret):
    o, _ = _flash_fwd(q, k, v, seed_arr, sm_scale, rate, block_q, block_k,
                      interpret)
    return o


def _prep(q, k, v, sm_scale, block_q, block_k):
    """Scale q, flatten batch·head, pad both sequence axes to their block
    multiples. Returns the padded 3-D operands plus (bq, bk) block sizes."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, spq = _block_pad(sq, block_q)
    bk, spk = _block_pad(sk, block_k)
    qs = (q * jnp.asarray(sm_scale, q.dtype)).reshape(b * h, sq, d)
    q3 = _pad_seq(qs, spq)
    k3 = _pad_seq(k.reshape(b * h, sk, d), spk)
    v3 = _pad_seq(v.reshape(b * h, sk, d), spk)
    return q3, k3, v3, bq, bk


def _flash_fwd(q, k, v, seed_arr, sm_scale, rate, block_q, block_k,
               interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    q3, k3, v3, bq, bk = _prep(q, k, v, sm_scale, block_q, block_k)
    o3, lse3 = _fwd_call(q3, k3, v3, seed_arr, rate, bq, bk, sk, interpret)
    o = o3[:, :sq].reshape(b, h, sq, d)
    # residuals keep the UNPADDED primals so every real length stays a
    # static shape in bwd; re-padding there is a cheap fusable op.
    return o, (q, k, v, o3, lse3, seed_arr)


def _flash_bwd(sm_scale, rate, block_q, block_k, interpret, res, do):
    q, k, v, o3, lse3, seed_arr = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    q3, k3, v3, bq, bk = _prep(q, k, v, sm_scale, block_q, block_k)
    do3 = _pad_seq(do.reshape(b * h, sq, d), q3.shape[1])
    delta3 = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32),
                     axis=-1, keepdims=True)
    dq3, dk3, dv3 = _bwd_call(q3, k3, v3, do3, lse3, delta3, seed_arr,
                              rate, bq, bk, sq, sk, interpret)
    dq = (dq3[:, :sq] * jnp.asarray(sm_scale, dq3.dtype)).reshape(q.shape)
    dk = dk3[:, :sk].reshape(k.shape)
    dv = dv3[:, :sk].reshape(v.shape)
    return dq, dk, dv, np.zeros(seed_arr.shape, dtype=jax.dtypes.float0)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, sm_scale: float = 1.0,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jnp.ndarray] = None,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention: ``softmax(sm_scale · q kᵀ) v`` with optional
    in-kernel attention-probs dropout.

    q: ``[B, H, Sq, D]``; k/v: ``[B, H, Sk, D]`` (bf16 recommended).
    ``dropout_seed`` is an int32 scalar (traced values fine) — REQUIRED
    when dropout_rate > 0; the same seed reproduces the same mask (fwd and
    bwd regenerate it identically, so gradients are exact for the sampled
    mask).
    """
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed_arr = jnp.reshape(
        jnp.asarray(dropout_seed if dropout_seed is not None else 0,
                    jnp.int32), (1,))
    return _flash(q, k, v, seed_arr, float(sm_scale), float(dropout_rate),
                  int(block_q), int(block_k), bool(interpret))


def attention_reference(q, k, v, sm_scale: float = 1.0) -> jnp.ndarray:
    """XLA einsum attention (deterministic) — the parity oracle."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
