"""Differentiable fused NeRF trunk: custom-VJP around the Pallas kernel.

Why: Phase-A training dominates the reference schedule (120k steps) and the
XLA point-major train step is HBM-bound at ~53 TFLOP/s — every layer
round-trips a [points, 256] activation through HBM in BOTH directions. This
pairs the forward kernel (tgtc.ops.pallas.nerf_mlp) with a backward kernel
that recomputes activations tile-by-tile in VMEM and accumulates packed
weight gradients across the grid, so HBM traffic is pts/dirs + rgb/sigma
cotangents + one [256, C] gradient buffer.

Gradients flow to the WEIGHTS only — points/dirs are not differentiated
(ray sampling is stop-gradient in NeRF training, and hierarchical depths
are detached, /root/reference/utils.py:573-580).

``pack_nerf_params_traceable`` is the jnp (differentiable) twin of the
numpy ``pack_nerf_params``; calling the custom-VJP apply on a
traceably-packed tree lets XLA route the packed gradients back onto the
flax pytree automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgtc.ops.pallas.nerf_mlp import (
    HEAD_W,
    TRUNK_W,
    _encoding_matrices,
    fused_nerf_apply_t,
)


def pack_nerf_params_traceable(
    params: Any,
    depth: int = 8,
    num_freq_coor: int = 10,
    num_freq_dir: int = 4,
    skip: int = 4,
    width: int = 256,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """jnp twin of ``pack_nerf_params`` — same layout, differentiable, so
    grads w.r.t. the packed buffers flow back onto the flax pytree."""
    p = params["params"]
    ec, ed = 6 * num_freq_coor, 6 * num_freq_dir
    in_c = 3 + ec

    def kern(name):
        return jnp.transpose(jnp.asarray(p[name]["kernel"], jnp.float32))

    def bias(name):
        return jnp.asarray(p[name]["bias"], jnp.float32)[:, None]

    t_rows = max(width, TRUNK_W)

    def pad_t(a):
        return jnp.pad(a, ((0, t_rows - a.shape[0]), (0, 0)))

    blocks = [pad_t(kern("base_0")), pad_t(bias("base_0"))]
    for i in range(1, depth):
        wi = kern(f"base_{i}")
        if i == skip + 1:
            blocks += [pad_t(wi[:, :in_c]), pad_t(wi[:, in_c:]),
                       pad_t(bias(f"base_{i}"))]
        else:
            blocks += [pad_t(wi), pad_t(bias(f"base_{i}"))]
    blocks += [pad_t(kern("base_remap")), pad_t(bias("base_remap"))]
    w1 = jnp.concatenate(blocks, axis=1)

    h_rows = max(width // 2, HEAD_W)

    def pad_r(a):
        return jnp.pad(a, ((0, h_rows - a.shape[0]), (0, 0)))

    w2 = jnp.concatenate([
        pad_r(kern("sigma")), pad_r(bias("sigma")),
        pad_r(kern("rgb_0")), pad_r(bias("rgb_0")),
        pad_r(kern("rgb_1")), pad_r(bias("rgb_1")),
    ], axis=1)

    import numpy as np

    pmat_c, phase_c = _encoding_matrices(num_freq_coor)
    pmat_d, phase_d = _encoding_matrices(num_freq_dir)
    e_rows = max(ec, ed, 8)

    def pad_np(a):
        out = np.zeros((e_rows, a.shape[1]), np.float32)
        out[: a.shape[0]] = a
        return out

    enc = jnp.asarray(
        np.concatenate([pad_np(pmat_c), pad_np(phase_c),
                        pad_np(pmat_d), pad_np(phase_d)], axis=1)
    )
    return w1.astype(dtype), w2.astype(dtype), enc


def _make_bwd_kernel(depth: int, skip: int, num_freq_coor: int,
                     num_freq_dir: int, width: int):
    ec, ed = 6 * num_freq_coor, 6 * num_freq_dir
    in_c, in_d = 3 + ec, 3 + ed
    tw = width
    hw = width // 2

    def kernel(pts_ref, dirs_ref, grgb_ref, gsig_ref, w1_ref, w2_ref,
               enc_ref, dw1_ref, dw2_ref):
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)

        enc = enc_ref[:]
        pmat_c, phase_c = enc[:ec, 0:3], enc[:ec, 3:4]
        pmat_d, phase_d = enc[:ed, 4:7], enc[:ed, 7:8]

        pts = pts_ref[:].astype(f32)
        e_c = jnp.concatenate(
            [pts, jnp.sin(mm(pmat_c, pts) + phase_c)], axis=0
        ).astype(bf16)                                     # [in_c, T]
        dirs = dirs_ref[:].astype(f32)
        e_d = jnp.concatenate(
            [dirs, jnp.sin(mm(pmat_d, dirs) + phase_d)], axis=0
        ).astype(bf16)                                     # [in_d, T]

        w1 = w1_ref[:]
        off = 0
        offs = []  # (col_offset, cols, rows) per block, forward order

        def take(cols, rows=tw):
            nonlocal off
            blk = w1[:rows, off : off + cols]
            offs.append((off, cols, rows))
            off += cols
            return blk

        # ---- forward recompute, keeping activations in VMEM
        w0, b0 = take(in_c), take(1)
        hs = []
        h = jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
        hs.append(h)
        layer_ws = []
        for i in range(1, depth):
            if i == skip + 1:
                wx, wh, b = take(in_c), take(tw), take(1)
                layer_ws.append((wx, wh))
                h = mm(wh, h) + mm(wx, e_c) + b.astype(f32)
            else:
                wh, b = take(tw), take(1)
                layer_ws.append((None, wh))
                h = mm(wh, h) + b.astype(f32)
            h = jnp.maximum(h, 0.0).astype(bf16)
            hs.append(h)
        wrm, brm = take(tw, rows=TRUNK_W), take(1, rows=TRUNK_W)
        br = jnp.maximum(mm(wrm, hs[-1]) + brm.astype(f32), 0.0).astype(bf16)

        w2 = w2_ref[:]
        off2 = 0
        offs2 = []

        def take2(cols):
            nonlocal off2
            blk = w2[:, off2 : off2 + cols]
            offs2.append((off2, cols))
            off2 += cols
            return blk

        wsig, bsig = take2(tw), take2(1)
        wr0, br0 = take2(TRUNK_W + in_d), take2(1)
        rf = jnp.maximum(
            mm(wr0[:hw, :TRUNK_W], br) + mm(wr0[:hw, TRUNK_W:], e_d)
            + br0[:hw].astype(f32), 0.0,
        ).astype(bf16)                                     # [hw, T]
        wr1, br1 = take2(hw), take2(1)
        rgb = jax.nn.sigmoid(mm(wr1[:3], rf) + br1[:3].astype(f32))  # [3,T]

        # ---- backward
        g_rgb = grgb_ref[:].astype(f32)                    # [3, T]
        g_sig = gsig_ref[:].astype(f32)                    # [1, T]

        h_rows2 = dw2_ref.shape[0]

        def pad_rows2(a):
            return jnp.pad(a, ((0, h_rows2 - a.shape[0]), (0, 0)))

        def acc2(idx, val):
            o, c = offs2[idx]
            dw2_ref[:, o : o + c] += pad_rows2(val.astype(f32))

        gs = (g_rgb * rgb * (1.0 - rgb)).astype(bf16)      # [3, T]
        acc2(4, mm(gs, rf.T))                              # d wr1 rows 0:3
        acc2(5, jnp.sum(gs.astype(f32), axis=1, keepdims=True))
        g_rf = mm(wr1[:3].T, gs)                           # [hw, T]
        g_rf = jnp.where(rf.astype(f32) > 0, g_rf, 0.0).astype(bf16)
        acc2(2, jnp.concatenate(
            [mm(g_rf, br.T), mm(g_rf, e_d.T)], axis=1))    # d wr0
        acc2(3, jnp.sum(g_rf.astype(f32), axis=1, keepdims=True))
        g_br = mm(wr0[:hw, :TRUNK_W].T, g_rf)              # [256, T]
        g_br = jnp.where(br.astype(f32) > 0, g_br, 0.0).astype(bf16)
        acc2(0, mm(g_sig.astype(bf16), hs[-1].T))          # d wsig row 0
        acc2(1, jnp.sum(g_sig, axis=1, keepdims=True))

        t_rows = dw1_ref.shape[0]

        def pad_rows1(a):
            return jnp.pad(a, ((0, t_rows - a.shape[0]), (0, 0)))

        def acc1(idx, val):
            o, c, _ = offs[idx]
            dw1_ref[:, o : o + c] += pad_rows1(val.astype(f32))

        n_blk = len(offs)
        acc1(n_blk - 2, mm(g_br, hs[-1].T))                # d wrm
        acc1(n_blk - 1, jnp.sum(g_br.astype(f32), axis=1, keepdims=True))
        g_h = mm(wrm.T, g_br) + mm(wsig[:1].T, g_sig.astype(bf16))  # [tw,T]

        blk = n_blk - 2
        for i in range(depth - 1, 0, -1):
            g = jnp.where(hs[i].astype(f32) > 0, g_h, 0.0).astype(bf16)
            wx, wh = layer_ws[i - 1]
            if wx is not None:  # skip layer: blocks [wx | wh | b]
                blk -= 3
                acc1(blk, mm(g, e_c.T))
                acc1(blk + 1, mm(g, hs[i - 1].T))
                acc1(blk + 2, jnp.sum(g.astype(f32), axis=1, keepdims=True))
            else:
                blk -= 2
                acc1(blk, mm(g, hs[i - 1].T))
                acc1(blk + 1, jnp.sum(g.astype(f32), axis=1, keepdims=True))
            g_h = mm(wh.T, g)
        g = jnp.where(hs[0].astype(f32) > 0, g_h, 0.0).astype(bf16)
        acc1(0, mm(g, e_c.T))
        acc1(1, jnp.sum(g.astype(f32), axis=1, keepdims=True))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skip", "num_freq_coor", "num_freq_dir",
                     "width", "tile", "interpret"),
)
def _fused_nerf_bwd(
    w1, w2, enc, pts_t, dirs_t, g_rgb, g_sigma,
    depth=8, skip=4, num_freq_coor=10, num_freq_dir=4, width=256,
    tile=1024, interpret=False,
):
    p = pts_t.shape[1]
    assert p % tile == 0, (p, tile)
    grid = (p // tile,)
    pt_spec = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    acc_spec = lambda a: pl.BlockSpec(a, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dw1, dw2 = pl.pallas_call(
        _make_bwd_kernel(depth, skip, num_freq_coor, num_freq_dir, width),
        grid=grid,
        in_specs=[pt_spec(3), pt_spec(3), pt_spec(3), pt_spec(1),
                  full(w1), full(w2), full(enc)],
        out_specs=(acc_spec(w1.shape), acc_spec(w2.shape)),
        out_shape=(
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(pts_t, dirs_t, g_rgb, g_sigma, w1, w2, enc)
    return dw1, dw2


def make_diff_apply(depth=8, skip=4, num_freq_coor=10, num_freq_dir=4,
                    width=256, tile=1024, interpret=False):
    """Build a differentiable ``(w1, w2, enc, pts_t, dirs_t) → (rgb [3,P],
    sigma [1,P])`` with kernel forward AND backward. Gradients flow to
    w1/w2 only (enc/pts/dirs get zeros)."""
    kw = dict(depth=depth, skip=skip, num_freq_coor=num_freq_coor,
              num_freq_dir=num_freq_dir, width=width, interpret=interpret)

    @jax.custom_vjp
    def apply(w1, w2, enc, pts_t, dirs_t):
        return fused_nerf_apply_t(w1, w2, enc, pts_t, dirs_t, tile=tile, **kw)

    def fwd(w1, w2, enc, pts_t, dirs_t):
        out = apply(w1, w2, enc, pts_t, dirs_t)
        return out, (w1, w2, enc, pts_t, dirs_t)

    def bwd(res, cotangents):
        w1, w2, enc, pts_t, dirs_t = res
        g_rgb, g_sigma = cotangents
        dw1, dw2 = _fused_nerf_bwd(
            w1, w2, enc, pts_t, dirs_t,
            g_rgb.astype(jnp.float32), g_sigma.astype(jnp.float32),
            tile=tile, **kw,
        )
        return (dw1.astype(w1.dtype), dw2.astype(w2.dtype),
                jnp.zeros_like(enc), jnp.zeros_like(pts_t),
                jnp.zeros_like(dirs_t))

    apply.defvjp(fwd, bwd)
    return apply
