"""Full-resolution C3 stylization on TPU — the O(S)-attention capability.

Stylizes a 756×1008 content image (94×126 = 11,844 tokens) against a
512×512 style (4,096 tokens — rectangular cross-attention) through the
full StyTrans forward. The XLA einsum path would materialize
[B,H,Sq,Sk] probs ≈ 8×11844×11844 bf16 ≈ 2.1 GB per attention site (9
sites) — far over a v5e's 16 GB HBM with activations; the flash kernel
streams K/V through VMEM so peak memory stays O(S).

Reference analog: the torch pipeline stylizes at gen resolution and is
similarly S²-bound (/root/reference/tctrans.py:188-233).

    python perf/bench_c3_fullres.py [--attn flash]
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

from tgtc.models.stytrans import make_stytrans
from tgtc.models.transformer import TransformerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", default="flash", choices=["flash", "xla"])
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--style_size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    mcfg = TransformerConfig(dtype=jnp.bfloat16, attn_impl=args.attn)
    model, params = make_stytrans(jax.random.PRNGKey(0), mcfg,
                                  image_size=256)
    rng = np.random.default_rng(0)
    content = jnp.asarray(
        rng.uniform(size=(1, args.height, args.width, 3)), jnp.float32)
    style = jnp.asarray(
        rng.uniform(size=(1, args.style_size, args.style_size, 3)),
        jnp.float32)

    fn = jax.jit(lambda p, c, s: jnp.sum(
        model.apply(p, c, s, method=model.stylize)[0].astype(jnp.float32)))
    t0 = time.time()
    float(np.asarray(fn(params, content, style)))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(args.reps):
        acc = fn(params, content, style)
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / args.reps
    sq = (args.height // 8) * (args.width // 8)
    print(json.dumps({
        "metric": "c3_fullres_stylize_seconds",
        "attn": args.attn,
        "resolution": f"{args.height}x{args.width}",
        "content_tokens": sq,
        "style_tokens": (args.style_size // 8) ** 2,
        "seconds": round(dt, 3),
        "compile_seconds": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
