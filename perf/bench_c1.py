"""C1 (StyTrans pretrain) step timing on TPU + host-stall fraction.

Measures (a) the pure device step on resident batches and (b) the
production loop with CropBatchPrefetcher feeding real JPEG decodes — the
difference is the host stall the prefetcher is supposed to hide
(VERDICT r1 item 6: <10% target).

    python perf/bench_c1.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.data.prefetch import CropBatchPrefetcher
from tgtc.models.stytrans import make_stytrans
from tgtc.train.transformer2d import (
    TransformerTrainConfig,
    dropout_key,
    init_transformer_train,
    make_transformer_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--workdir", default="/tmp/tgtc_c1_bench")
    ap.add_argument("--f32", action="store_true",
                    help="force f32 compute (default: bf16, the TPU "
                         "production setting)")
    ap.add_argument("--attn", default="xla", choices=["xla", "flash"],
                    help="attention implementation (flash = fused Pallas "
                         "kernel with in-kernel dropout)")
    args = ap.parse_args()

    # a dir of real 512x512 jpgs to decode
    from PIL import Image

    img_dir = os.path.join(args.workdir, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(24):
        p = os.path.join(img_dir, f"im{i:02d}.jpg")
        if not os.path.exists(p):
            Image.fromarray(
                (rng.uniform(size=(512, 512, 3)) * 255).astype(np.uint8)
            ).save(p, quality=92)
        paths.append(p)

    from tgtc.models.transformer import TransformerConfig

    tcfg = TransformerTrainConfig()
    mcfg = TransformerConfig(
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        attn_impl=args.attn)
    model, params = make_stytrans(jax.random.PRNGKey(0), mcfg,
                                  image_size=tcfg.patch)
    state = init_transformer_train(params, tcfg)
    step_fn = make_transformer_train_step(model, tcfg)
    key = dropout_key(1)

    batch = jnp.asarray(
        rng.uniform(size=(tcfg.batch_size, tcfg.patch, tcfg.patch, 3)),
        jnp.float32)
    t0 = time.time()
    state, m = step_fn(state, batch, batch, key)
    float(np.asarray(m["loss"]))
    print(f"compile: {time.time()-t0:.0f} s", flush=True)

    # (a) pure device step
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step_fn(state, batch, batch, key)
    float(np.asarray(m["loss"]))
    dev = (time.perf_counter() - t0) / args.iters

    # (b) production loop with prefetched real decodes
    with CropBatchPrefetcher(paths, tcfg.batch_size, tcfg.patch,
                             seed=0) as cpf, \
         CropBatchPrefetcher(paths, tcfg.batch_size, tcfg.patch,
                             seed=1) as spf:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, jnp.asarray(cpf.next()),
                               jnp.asarray(spf.next()), key)
        float(np.asarray(m["loss"]))
        full = (time.perf_counter() - t0) / args.iters

    stall = max(0.0, (full - dev) / full)
    # achieved TFLOP/s from the compiled program's own cost model (VERDICT
    # r2 item 4: report vs the v5e bf16 peak of ~197 TFLOP/s). Flash
    # attention's FLOPs live inside a custom call XLA can't cost, so with
    # --attn flash this number undercounts (it is exact for --attn xla).
    tflops = None
    try:
        ca = step_fn.lower(state, batch, batch, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        tflops = float(ca["flops"]) / dev / 1e12
    except Exception as e:
        print(f"[cost_analysis unavailable: {e}]", flush=True)
    print(json.dumps({
        "metric": "c1_step_seconds",
        "dtype": "f32" if args.f32 else "bf16",
        "attn": args.attn,
        "device_only": round(dev, 4),
        "with_prefetched_decode": round(full, 4),
        "host_stall_fraction": round(stall, 4),
        "steps_per_sec": round(1.0 / full, 2),
        "achieved_tflops": None if tflops is None else round(tflops, 1),
        "v5e_bf16_peak_tflops": 197,
    }))


if __name__ == "__main__":
    main()
