"""TPU render-path profiler: stage bisect + kernel throughput, one process.

Run serially on the real chip (concurrent TPU processes have wedged the
tunneled compile service before — see .claude/skills/verify/SKILL.md):

    python perf/profile_render.py

Prints per-stage timings of the fused render pipeline (sampling, coarse
kernel, composite, resample, fine kernel), the fused trunk and style-chain
kernel throughputs, and sort vs merge_two_sorted for hierarchical
resampling. Uses the fold-to-scalar + single-fetch protocol (the tunnel's
block_until_ready is unreliable).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig
from tgtc.models.style_field import StyleFieldConfig, init_latents, make_style_mlps
from tgtc.ops.composite import alpha_composite, sigma_weights
from tgtc.ops.pallas.nerf_mlp import (
    fused_nerf_apply_t,
    fused_nerf_sigma_apply_t,
    pack_nerf_params,
)
from tgtc.ops.pallas.style_kernel import fused_style_apply_t, pack_style_params
from tgtc.ops.sampling import (
    merge_two_sorted,
    sample_along_rays_uniform,
    sample_pdf,
)
from tgtc.render.fast import _points_t
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

B, NC, NFINE = 16384, 64, 64
NF = NC + NFINE


def timeit(f, *args, n=10):
    fold = jax.jit(lambda acc, o: acc + jnp.sum(jax.tree.leaves(o)[0]))
    acc = fold(jnp.zeros(()), f(*args))
    float(np.asarray(acc))  # compile + sync
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(n):
        acc = fold(acc, f(*args))
    float(np.asarray(acc))
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig()
    cm, fm, state = init_state(key, nerf_cfg, NerfTrainConfig())
    pc = pack_nerf_params(state.params_coarse)
    pf = pack_nerf_params(state.params_fine)

    ro = jax.random.uniform(key, (B, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(key, (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    def stage(upto, coarse_rgb):
        """Mirror make_fused_render_fn (tgtc/render/fast.py) stage by stage.
        coarse_rgb=False is the production Phase-F/bench path (sigma-only
        coarse pass, round 3)."""

        @jax.jit
        def f(ro, rd):
            _, ts = sample_along_rays_uniform(ro, rd, NC, near=0.0, far=1.0)
            pt, dt = _points_t(ro, rd, ts)
            if upto == "sample":
                return jnp.sum(pt)
            if coarse_rgb:
                rgb_t, sigma_t = fused_nerf_apply_t(*pc, pt, dt)
                if upto == "coarse_mlp":
                    return jnp.sum(rgb_t)
                rgb_c = rgb_t.reshape(3, B, NC).transpose(1, 2, 0)
                comp = alpha_composite(rgb_c, sigma_t.reshape(B, NC), ts)
                weights = comp.weights
            else:
                sig_t = fused_nerf_sigma_apply_t(*pc, pt)
                if upto == "coarse_mlp":
                    return jnp.sum(sig_t)
                weights = sigma_weights(sig_t.reshape(B, NC), ts)
            if upto == "coarse_comp":
                return jnp.sum(weights)
            ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
            t_new = sample_pdf(ts_mid, weights[..., 1:-1], NFINE)
            ts_f = jnp.sort(jnp.concatenate([ts, t_new], -1), -1)
            if upto == "resample_sort":
                return jnp.sum(ts_f)
            ptf, dtf = _points_t(ro, rd, ts_f)
            rgb_t2, sigma_t2 = fused_nerf_apply_t(*pf, ptf, dtf)
            if upto == "fine_mlp":
                return jnp.sum(rgb_t2)
            rgb_f = rgb_t2.reshape(3, B, NF).transpose(1, 2, 0)
            comp_f = alpha_composite(rgb_f, sigma_t2.reshape(B, NF), ts_f)
            return jnp.sum(comp_f.rgb)

        return f

    for coarse_rgb in (False, True):
        prev = 0.0
        label = "coarse_rgb=True" if coarse_rgb else \
            "sigma-only coarse (production)"
        print(f"== stage bisect (B={B}, {label}) ==")
        for upto in ["sample", "coarse_mlp", "coarse_comp", "resample_sort",
                     "fine_mlp", "full"]:
            t = timeit(stage(upto, coarse_rgb), ro, rd)
            print(f"  {upto:14s}: {t * 1000:7.1f} ms "
                  f"(+{(t - prev) * 1000:6.1f})")
            prev = t
        print(f"  full pipeline → {B / prev:,.0f} rays/s")

    # ERT (fine_budget) bisect: where does the selection cost land?
    from tgtc.ops.sampling import select_sample_budget

    def stage_ert(upto, budget):
        @jax.jit
        def f(ro, rd):
            _, ts = sample_along_rays_uniform(ro, rd, NC, near=0.0, far=1.0)
            pt, _ = _points_t(ro, rd, ts)
            sig_t = fused_nerf_sigma_apply_t(*pc, pt)
            weights = sigma_weights(sig_t.reshape(B, NC), ts)
            ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
            t_new = sample_pdf(ts_mid, weights[..., 1:-1], NFINE)
            ts_f = jnp.sort(jnp.concatenate([ts, t_new], -1), -1)
            if upto == "resample_sort":
                return jnp.sum(ts_f)
            ts_k, deltas_k = select_sample_budget(
                ts_f, ts, sig_t.reshape(B, NC), budget)
            if upto == "select":
                return jnp.sum(ts_k) + jnp.sum(deltas_k)
            ptf, dtf = _points_t(ro, rd, ts_k)
            rgb_t2, sigma_t2 = fused_nerf_apply_t(*pf, ptf, dtf)
            if upto == "fine_mlp":
                return jnp.sum(rgb_t2)
            rgb_f = rgb_t2.reshape(3, B, budget).transpose(1, 2, 0)
            comp_f = alpha_composite(rgb_f, sigma_t2.reshape(B, budget),
                                     ts_k, deltas=deltas_k)
            return jnp.sum(comp_f.rgb)

        return f

    for budget in (80, 64):
        print(f"== ERT bisect (B={B}, fine_budget={budget}) ==")
        prev = 0.0
        for upto in ["resample_sort", "select", "fine_mlp", "full"]:
            t = timeit(stage_ert(upto, budget), ro, rd)
            print(f"  {upto:14s}: {t * 1000:7.1f} ms "
                  f"(+{(t - prev) * 1000:6.1f})")
            prev = t
        print(f"  full ERT pipeline → {B / prev:,.0f} rays/s")

    # sort vs merge
    _, ts = jax.jit(lambda o, d: sample_along_rays_uniform(o, d, NC))(ro, rd)
    # weights [R, B-1] for bins [R, B], as the real path slices them
    w = jax.random.uniform(key, (B, NC))[..., 1:-1]
    ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
    t_new = jax.jit(lambda a, b: sample_pdf(a, b, NFINE))(ts_mid, w)
    t_sort = timeit(jax.jit(
        lambda a, b: jnp.sort(jnp.concatenate([a, b], -1), -1)), ts, t_new)
    t_merge = timeit(jax.jit(merge_two_sorted), ts, t_new)
    print(f"== resample merge: sort {t_sort*1e3:.2f} ms vs "
          f"merge_two_sorted {t_merge*1e3:.2f} ms ==")

    # style kernel throughput
    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    _, pcat, _, psty = make_style_mlps(field, jax.random.fold_in(key, 1))
    packed = pack_style_params(state.params_coarse, pcat, psty)
    P = B * NF
    pts_t = jax.random.uniform(key, (3, P), minval=-1, maxval=1)
    lat_t = jax.random.normal(key, (32, P)) * 0.3
    t = timeit(lambda: fused_style_apply_t(*packed, pts_t, lat_t), n=5)
    print(f"== style kernel: {t*1e3:.1f} ms for {P} pts → "
          f"{P/t/1e6:.0f} Mpts/s (~{P*1.9e6/t/1e12:.0f} TFLOP/s) ==")

    t = timeit(lambda: fused_nerf_apply_t(*pc, pts_t,
                                          jnp.ones_like(pts_t)), n=5)
    print(f"== trunk kernel: {t*1e3:.1f} ms for {P} pts → "
          f"{P/t/1e6:.0f} Mpts/s (~{P*1.18e6/t/1e12:.0f} TFLOP/s) ==")


if __name__ == "__main__":
    main()
