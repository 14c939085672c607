"""C1 step component bisect: where do the 0.43 s actually go?

    python perf/profile_c1.py [--f32]

Times, as separate jitted programs on resident batches (batch 8 x 256^2):
  vgg_fwd        one 5-stage VGG pyramid
  losses_fwd     full StyTrans compute_losses forward (5 pyramids,
                 3 transformer+decoder passes)
  train_step     full fwd+bwd+Adam (the production step)
plus per-module forwards (embed+transformer, decoder).
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
from tgtc.train.transformer2d import (
    TransformerTrainConfig, dropout_key, init_transformer_train,
    make_transformer_train_step,
)


def timeit(fn, *args, reps=5):
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
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--attn", default="xla", choices=["xla", "flash"])
    args = ap.parse_args()
    dt = jnp.float32 if args.f32 else jnp.bfloat16

    mcfg = TransformerConfig(dtype=dt, attn_impl=args.attn)
    tcfg = TransformerTrainConfig()
    model, params = make_stytrans(jax.random.PRNGKey(0), mcfg,
                                  image_size=tcfg.patch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(8, 256, 256, 3)), jnp.float32)
    key = dropout_key(1)

    res = {"dtype": "f32" if args.f32 else "bf16", "attn": args.attn}

    vgg_fwd = jax.jit(lambda p, a: model.apply(
        p, a, method=model.encode_pyramid))
    res["vgg_fwd_ms"] = round(timeit(vgg_fwd, params, x) * 1e3, 1)
    print("vgg_fwd", res["vgg_fwd_ms"], file=sys.stderr, flush=True)

    trans_fwd = jax.jit(lambda p, a, b: model.apply(
        p, a, b, method=model.stylize))
    res["stylize_fwd_ms"] = round(timeit(trans_fwd, params, x, x) * 1e3, 1)
    print("stylize_fwd", res["stylize_fwd_ms"], file=sys.stderr, flush=True)

    losses_fwd = jax.jit(lambda p, a, b: model.apply(
        p, a, b, True, method=model.compute_losses))
    res["losses_fwd_ms"] = round(timeit(losses_fwd, params, x, x) * 1e3, 1)
    print("losses_fwd", res["losses_fwd_ms"], file=sys.stderr, flush=True)

    state = init_transformer_train(params, tcfg)
    step = make_transformer_train_step(model, tcfg)

    def run(state):
        s, m = step(state, x, x, key)
        return m

    # separate protocol: step donates state, so rebuild per rep is unfair;
    # run a chain instead
    s, m = step(state, x, x, key)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        s, m = step(s, x, x, key)
    float(np.asarray(m["loss"]))
    res["train_step_ms"] = round((time.perf_counter() - t0) / n * 1e3, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
