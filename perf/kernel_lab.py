"""Trunk-kernel experiment lab: measure fused NeRF-MLP kernel variants
against the production kernel and the matmul-only microkernel ceiling.

    python perf/kernel_lab.py [--tile 4096] [--points 1048576]

Round-2 state: production kernel 88-101 Mpts/s (~119 TFLOP/s) vs ~157
TFLOP/s microkernel ceiling; the gap is VPU epilogues (sin encoding,
relu/cast between layers, sigmoid) serializing against the MXU. Variants:

  v0      production kernel (tgtc.ops.pallas.nerf_mlp)
  v1      bf16 accumulation between trunk layers (no f32->bf16 cast chain)
  v2      two half-tiles interleaved inside the kernel (independent
          dependency chains let Mosaic overlap VPU epilogues with MXU)
  ceiling 8-layer 256x256 matmul chain, no encoding/heads/nonlinearity
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgtc.ops.pallas.nerf_mlp import (
    TRUNK_W, _encoding_matrices, fused_nerf_apply_t, pack_nerf_params,
)

EC, ED = 60, 24
IN_C, IN_D = 63, 27
FLOPS_PER_PT = 2 * (63 * 256 + 6 * 256 * 256 + 63 * 256 + 256 * 256 + 256
                    + (256 + 27) * 128 + 128 * 3)


def _trunk_body(mm, w1, e_c, depth=8, skip=4, tw=256, acc_dtype=jnp.float32,
                out_dtype=jnp.bfloat16):
    """Shared trunk-layer chain; returns (h, base_remap) in out_dtype."""
    off = 0

    def take(cols, rows=tw):
        nonlocal off
        blk = w1[:rows, off: off + cols]
        off += cols
        return blk

    w0, b0 = take(IN_C), take(1)
    h = jnp.maximum(mm(w0, e_c) + b0.astype(acc_dtype), 0.0).astype(out_dtype)
    for i in range(1, depth):
        if i == skip + 1:
            wx, wh, b = take(IN_C), take(tw), take(1)
            h = mm(wh, h) + mm(wx, e_c) + b.astype(acc_dtype)
        else:
            wh, b = take(tw), take(1)
            h = mm(wh, h) + b.astype(acc_dtype)
        h = jnp.maximum(h, 0.0).astype(out_dtype)
    wrm, brm = take(tw, rows=TRUNK_W), take(1, rows=TRUNK_W)
    br = jnp.maximum(mm(wrm, h) + brm.astype(acc_dtype), 0.0).astype(out_dtype)
    return h, br


def _heads(mm, w2, h, br, e_d, f32=jnp.float32, bf16=jnp.bfloat16):
    off = 0

    def take2(cols):
        nonlocal off
        blk = w2[:, off: off + cols]
        off += cols
        return blk

    wsig, bsig = take2(256), take2(1)
    sigma = mm(wsig[:1], h) + bsig[:1].astype(f32)
    wr0, br0 = take2(TRUNK_W + IN_D), take2(1)
    rf = jnp.maximum(
        mm(wr0[:128, :TRUNK_W], br) + mm(wr0[:128, TRUNK_W:], e_d)
        + br0[:128].astype(f32), 0.0,
    ).astype(bf16)
    wr1, br1 = take2(128), take2(1)
    rgb = jax.nn.sigmoid(mm(wr1[:3], rf) + br1[:3].astype(f32))
    return rgb, sigma


def _encode(mm, enc, pts, dirs):
    f32, bf16 = jnp.float32, jnp.bfloat16
    pmat_c, phase_c = enc[:EC, 0:3], enc[:EC, 3:4]
    pmat_d, phase_d = enc[:ED, 4:7], enc[:ED, 7:8]
    e_c = jnp.concatenate(
        [pts, jnp.sin(mm(pmat_c, pts) + phase_c)], axis=0).astype(bf16)
    e_d = jnp.concatenate(
        [dirs, jnp.sin(mm(pmat_d, dirs) + phase_d)], axis=0).astype(bf16)
    return e_c, e_d


def kernel_v1(pts_ref, dirs_ref, w1_ref, w2_ref, enc_ref, rgb_ref, sigma_ref):
    """bf16 accumulation in the trunk chain."""
    f32, bf16 = jnp.float32, jnp.bfloat16

    def mmf(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmb(a, b):
        return jnp.dot(a, b, preferred_element_type=bf16)

    e_c, e_d = _encode(mmf, enc_ref[:], pts_ref[:].astype(f32),
                       dirs_ref[:].astype(f32))
    h, br = _trunk_body(mmb, w1_ref[:], e_c, acc_dtype=bf16, out_dtype=bf16)
    rgb, sigma = _heads(mmf, w2_ref[:], h, br, e_d)
    rgb_ref[:] = rgb.astype(rgb_ref.dtype)
    sigma_ref[:] = sigma.astype(sigma_ref.dtype)


def _make_split_kernel(n_chunks: int):
    """N independent sub-tiles: gives Mosaic's scheduler parallel
    dependency chains so epilogues of one chunk overlap matmuls of
    another."""

    def kernel(pts_ref, dirs_ref, w1_ref, w2_ref, enc_ref, rgb_ref,
               sigma_ref):
        f32 = jnp.float32

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        t = pts_ref.shape[1] // n_chunks
        w1, w2, enc = w1_ref[:], w2_ref[:], enc_ref[:]
        for c in range(n_chunks):
            sl = slice(c * t, (c + 1) * t)
            pts = pts_ref[:, sl].astype(f32)
            dirs = dirs_ref[:, sl].astype(f32)
            e_c, e_d = _encode(mm, enc, pts, dirs)
            h, br = _trunk_body(mm, w1, e_c)
            rgb, sigma = _heads(mm, w2, h, br, e_d)
            rgb_ref[:, sl] = rgb.astype(rgb_ref.dtype)
            sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)

    return kernel


kernel_v2 = _make_split_kernel(2)
kernel_v3 = _make_split_kernel(4)


def kernel_v4(pts_ref, dirs_ref, w1_ref, w2_ref, enc_ref, rgb_ref,
              sigma_ref):
    """Two sub-tiles with the layer chain EXPLICITLY interleaved (layer i
    of chunk A emitted adjacent to layer i of chunk B) — tests whether
    Mosaic's list scheduler needs the textual hint or already reorders the
    independent chains of v2."""
    f32, bf16 = jnp.float32, jnp.bfloat16

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    t = pts_ref.shape[1] // 2
    w1, w2, enc = w1_ref[:], w2_ref[:], enc_ref[:]
    sls = (slice(0, t), slice(t, 2 * t))
    e_cs, e_ds = [], []
    for sl in sls:
        e_c, e_d = _encode(mm, enc, pts_ref[:, sl].astype(f32),
                           dirs_ref[:, sl].astype(f32))
        e_cs.append(e_c)
        e_ds.append(e_d)

    # trunk layers, interleaved across the two chunks
    off = 0

    def take(cols, rows=TRUNK_W):
        nonlocal off
        blk = w1[:rows, off: off + cols]
        off += cols
        return blk

    w0, b0 = take(IN_C), take(1)
    hs = [jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
          for e_c in e_cs]
    for i in range(1, 8):
        if i == 5:  # skip + 1
            wx, wh, b = take(IN_C), take(TRUNK_W), take(1)
            hs = [mm(wh, h) + mm(wx, e_c) + b.astype(f32)
                  for h, e_c in zip(hs, e_cs)]
        else:
            wh, b = take(TRUNK_W), take(1)
            hs = [mm(wh, h) + b.astype(f32) for h in hs]
        hs = [jnp.maximum(h, 0.0).astype(bf16) for h in hs]
    wrm, brm = take(TRUNK_W), take(1)
    brs = [jnp.maximum(mm(wrm, h) + brm.astype(f32), 0.0).astype(bf16)
           for h in hs]
    for sl, h, br, e_d in zip(sls, hs, brs, e_ds):
        rgb, sigma = _heads(mm, w2, h, br, e_d)
        rgb_ref[:, sl] = rgb.astype(rgb_ref.dtype)
        sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)


def ceiling_kernel(x_ref, w_ref, out_ref):
    """8 chained 256x256 bf16 matmuls, f32 accum — the MXU ceiling shape."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    w = w_ref[:]
    h = x_ref[:]
    for i in range(8):
        h = jnp.dot(w[:, i * 256:(i + 1) * 256], h,
                    preferred_element_type=f32).astype(bf16)
    out_ref[:] = h.astype(out_ref.dtype)


def ceiling_split_kernel(x_ref, w_ref, out_ref):
    """Same chain, two independent half-tiles — measures how much of the
    ceiling gap is MXU pipeline drain on the serial layer chain."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    w = w_ref[:]
    t = x_ref.shape[1] // 2
    for sl in (slice(0, t), slice(t, 2 * t)):
        h = x_ref[:, sl]
        for i in range(8):
            h = jnp.dot(w[:, i * 256:(i + 1) * 256], h,
                        preferred_element_type=f32).astype(bf16)
        out_ref[:, sl] = h.astype(out_ref.dtype)


def run_variant(kernel_fn, w1, w2, enc, pts_t, dirs_t, tile):
    p = pts_t.shape[1]
    grid = (p // tile,)
    point_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[point_spec, point_spec, full(w1), full(w2), full(enc)],
        out_specs=(
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=FLOPS_PER_PT * p,
            bytes_accessed=(3 + 3 + 3 + 1) * p * 4,
            transcendentals=87 * p,
        ),
    )(pts_t, dirs_t, w1, w2, enc)


def timeit(fn, *args, reps=8):
    # exact tile_sweep protocol: single jitted fold into a carried scalar,
    # fetch once (the tunneled platform mis-times other shapes of loop)
    fold = jax.jit(lambda acc, o: acc + jnp.sum(jax.tree.leaves(o)[0]))
    acc = fold(jnp.zeros(()), fn(*args))
    float(np.asarray(acc))
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(reps):
        acc = fold(acc, fn(*args))
    float(np.asarray(acc))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--points", type=int, default=1 << 21)
    args = ap.parse_args()
    tile, p = args.tile, args.points

    rng = np.random.default_rng(0)
    # random packed weights at production shapes (value-independent timing)
    from bench import _numpy_nerf_params
    from tgtc.models.nerf import NerfConfig

    params = _numpy_nerf_params(rng, NerfConfig())
    w1, w2, enc = pack_nerf_params(params)
    pts_t = jnp.asarray(rng.uniform(-1, 1, (3, p)).astype(np.float32))
    dirs_t = jnp.asarray(rng.standard_normal((3, p)).astype(np.float32))

    results = {}

    ref = fused_nerf_apply_t(w1, w2, enc, pts_t[:, :tile], dirs_t[:, :tile],
                             tile=tile)
    t0 = timeit(functools.partial(fused_nerf_apply_t, tile=tile),
                w1, w2, enc, pts_t, dirs_t)
    results["v0_prod"] = p / t0 / 1e6
    print("v0:", results["v0_prod"], file=sys.stderr, flush=True)

    # sigma-only trunk variant (the production coarse pass, round 3) —
    # ~60% of the full kernel's FLOPs (no dir encoding / base_remap / rgb)
    from tgtc.ops.pallas.nerf_mlp import fused_nerf_sigma_apply_t

    ts = timeit(functools.partial(fused_nerf_sigma_apply_t, tile=tile),
                w1, w2, enc, pts_t)
    results["v0_sigma_only"] = p / ts / 1e6
    print("v0_sigma_only:", results["v0_sigma_only"], file=sys.stderr,
          flush=True)

    for name, kfn in (("v2_dual", kernel_v2), ("v3_quad", kernel_v3),
                      ("v4_interleaved", kernel_v4)):
        try:
            fn = jax.jit(functools.partial(run_variant, kfn, tile=tile))
            # correctness vs production on one tile
            got = fn(w1, w2, enc, pts_t[:, :tile], dirs_t[:, :tile])
            err = float(jnp.max(jnp.abs(got[0] - ref[0])))
            assert err < 1e-5, f"{name} rgb mismatch {err}"
            t = timeit(fn, w1, w2, enc, pts_t, dirs_t)
            results[name] = p / t / 1e6
        except Exception as e:
            results[name] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(name, results[name], file=sys.stderr, flush=True)

    # matmul-only ceiling at the same tile
    wc = jnp.asarray(rng.standard_normal((256, 8 * 256)).astype(np.float32),
                     jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((256, p // 4)).astype(np.float32),
                    jnp.bfloat16)

    def ceil_fn(wc, x, kern=ceiling_kernel):
        return pl.pallas_call(
            kern,
            grid=(x.shape[1] // tile,),
            in_specs=[
                pl.BlockSpec((256, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wc.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((256, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, x.shape[1]), jnp.bfloat16),
        )(x, wc)

    for cname, ck in (("ceiling_tflops", ceiling_kernel),
                      ("ceiling_split_tflops", ceiling_split_kernel)):
        try:
            tc = timeit(jax.jit(functools.partial(ceil_fn, kern=ck)), wc, x)
            results[cname] = 8 * 2 * 256 * 256 * (p // 4) / tc / 1e12
        except Exception as e:
            results[cname] = f"FAILED: {type(e).__name__}"
        print(cname, results[cname], file=sys.stderr, flush=True)

    results = {k: (round(v, 1) if isinstance(v, float) else v)
               for k, v in results.items()}
    results["unit"] = "Mpts/s (ceiling: TFLOP/s)"
    results["tflops_v0"] = round(
        results["v0_prod"] * 1e6 * FLOPS_PER_PT / 1e12, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
