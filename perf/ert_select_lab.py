"""ERT selection lab: where do select_sample_budget's ~2 ms/block go, and
which reformulation removes them?

The production ERT path (tgtc/render/fast.py, fine_budget) pays a selection
stage between the resample-sort and the fine kernel. Candidate levers:

* v1  direct bin index: the render path's coarse grid is an UNPERTURBED
      linspace, so ``idx = floor((t - near)/step)`` replaces the [R, M, B]
      comparison-count (tgtc/ops/sampling.py:199-203).
* v2  v1 + ``take_along_axis`` sigma gather instead of the one-hot einsum.
* v3  sort-carry selection: one stable ``lax.sort`` keyed on -score carrying
      (ts, deltas), slice K, re-sort by depth — no top_k, no [R, K, M]
      one-hot gather.
* v4  v1 + v3 combined.

Run serially on the real chip:  python perf/ert_select_lab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.ops.composite import sigma_weights
from tgtc.ops.sampling import sample_along_rays_uniform, sample_pdf

R, NC, NFINE = 16384, 64, 128
M = NC + NFINE
K = 80
NEAR, FAR = 0.0, 1.0


def timeit(f, *args, n=20):
    fold = jax.jit(lambda acc, o: acc + jnp.sum(jax.tree.leaves(o)[0]))
    acc = fold(jnp.zeros(()), f(*args))
    float(np.asarray(acc))  # compile + sync
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(n):
        acc = fold(acc, f(*args))
    float(np.asarray(acc))
    return (time.perf_counter() - t0) / n


def make_inputs(key):
    ko, kd, kw = jax.random.split(key, 3)
    ro = jax.random.uniform(ko, (R, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(kd, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    _, ts = sample_along_rays_uniform(ro, rd, NC, near=NEAR, far=FAR)
    sigma_c = 30.0 * jax.random.uniform(kw, (R, NC))
    weights = sigma_weights(sigma_c, ts)
    ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
    t_new = sample_pdf(ts_mid, weights[..., 1:-1], NFINE)
    ts_all = jnp.sort(jnp.concatenate([ts, t_new], -1), -1)
    return jax.device_put(ts_all), jax.device_put(ts), jax.device_put(sigma_c)


# ---- building blocks ----

def idx_compare(ts_all, ts_coarse):
    idx = jnp.sum(
        (ts_coarse[:, None, :] <= ts_all[:, :, None]).astype(jnp.int32),
        axis=-1,
    ) - 1
    return jnp.clip(idx, 0, NC - 1)


def idx_grid(ts_all):
    step = (FAR - NEAR) / (NC - 1)
    idx = jnp.floor((ts_all - NEAR) / step + 1e-4).astype(jnp.int32)
    return jnp.clip(idx, 0, NC - 1)


def sigma_onehot(idx, sigma_c):
    oh = (idx[..., None] == jnp.arange(NC)).astype(sigma_c.dtype)
    return jnp.einsum("rmb,rb->rm", oh, sigma_c)


def sigma_take(idx, sigma_c):
    return jnp.take_along_axis(sigma_c, idx, axis=-1)


def deltas_of(ts_all):
    d = ts_all[..., 1:] - ts_all[..., :-1]
    return jnp.concatenate([d, jnp.full_like(d[..., :1], 1e10)], axis=-1)


def keep_topk_onehot(score, ts_all, deltas):
    _, keep = jax.lax.top_k(score, K)
    keep = jnp.sort(keep, axis=-1)
    oh = (keep[..., None] == jnp.arange(M)).astype(ts_all.dtype)
    table = jnp.stack([ts_all, deltas], axis=-1)
    g = jnp.einsum("rkm,rmj->rkj", oh, table)
    return g[..., 0], g[..., 1]


def keep_sortcarry(score, ts_all, deltas):
    _, ts_s, dl_s = jax.lax.sort((-score, ts_all, deltas), num_keys=1)
    ts_k, dl_k = jax.lax.sort(
        (ts_s[..., :K], dl_s[..., :K]), num_keys=1)
    return ts_k, dl_k


# ---- variants ----

def v0(ts_all, ts, sigma_c):
    idx = idx_compare(ts_all, ts)
    score = sigma_weights(sigma_onehot(idx, sigma_c), ts_all)
    return keep_topk_onehot(score, ts_all, deltas_of(ts_all))


def v1(ts_all, ts, sigma_c):
    idx = idx_grid(ts_all)
    score = sigma_weights(sigma_onehot(idx, sigma_c), ts_all)
    return keep_topk_onehot(score, ts_all, deltas_of(ts_all))


def v2(ts_all, ts, sigma_c):
    idx = idx_grid(ts_all)
    score = sigma_weights(sigma_take(idx, sigma_c), ts_all)
    return keep_topk_onehot(score, ts_all, deltas_of(ts_all))


def v3(ts_all, ts, sigma_c):
    idx = idx_compare(ts_all, ts)
    score = sigma_weights(sigma_onehot(idx, sigma_c), ts_all)
    return keep_sortcarry(score, ts_all, deltas_of(ts_all))


def v4(ts_all, ts, sigma_c):
    idx = idx_grid(ts_all)
    score = sigma_weights(sigma_onehot(idx, sigma_c), ts_all)
    return keep_sortcarry(score, ts_all, deltas_of(ts_all))


def v5(ts_all, ts, sigma_c):
    idx = idx_grid(ts_all)
    score = sigma_weights(sigma_take(idx, sigma_c), ts_all)
    return keep_sortcarry(score, ts_all, deltas_of(ts_all))


def main():
    key = jax.random.PRNGKey(0)
    ts_all, ts, sigma_c = make_inputs(key)

    # sub-stage bisect of v0
    stages = {
        "idx_compare": lambda a, t, s: idx_compare(a, t),
        "+sigma_onehot": lambda a, t, s: sigma_onehot(idx_compare(a, t), s),
        "+score": lambda a, t, s: sigma_weights(
            sigma_onehot(idx_compare(a, t), s), a),
        "+topk+gather(full v0)": v0,
    }
    print(f"== v0 sub-stage bisect (R={R}, M={M}, NC={NC}, K={K}) ==")
    prev = 0.0
    for name, f in stages.items():
        t = timeit(jax.jit(f), ts_all, ts, sigma_c)
        print(f"  {name:24s}: {t*1e3:7.3f} ms (+{(t-prev)*1e3:6.3f})")
        prev = t

    print("== variants (full select) ==")
    ref_t, ref_d = jax.jit(v0)(ts_all, ts, sigma_c)
    ref_t, ref_d = np.asarray(ref_t), np.asarray(ref_d)
    for name, f in [("v0 current", v0), ("v1 grid-idx", v1),
                    ("v2 grid+take", v2), ("v3 sortcarry", v3),
                    ("v4 grid+sortcarry", v4), ("v5 grid+take+sort", v5)]:
        t = timeit(jax.jit(f), ts_all, ts, sigma_c)
        ot, od = jax.jit(f)(ts_all, ts, sigma_c)
        same = (np.array_equal(np.asarray(ot), ref_t)
                and np.array_equal(np.asarray(od), ref_d))
        print(f"  {name:20s}: {t*1e3:7.3f} ms   bitwise-equal-v0={same}")


if __name__ == "__main__":
    main()
