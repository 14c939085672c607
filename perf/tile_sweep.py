"""Tile-size sweep for the fused trunk and style kernels (one TPU proc).

    python perf/tile_sweep.py

Prints Mpts/s per tile size — picks the production defaults for
tgtc.render.fast / fast_style.
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
from tgtc.ops.pallas.nerf_mlp import fused_nerf_apply_t, pack_nerf_params
from tgtc.ops.pallas.style_kernel import fused_style_apply_t, pack_style_params
from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

P = 1 << 21  # 2M points


def timeit(f, *args, n=8):
    fold = jax.jit(lambda acc, o: acc + jnp.sum(jax.tree.leaves(o)[0]))
    acc = fold(jnp.zeros(()), f(*args))
    float(np.asarray(acc))
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
    packed = pack_nerf_params(state.params_coarse)
    pts = jax.random.uniform(key, (3, P), minval=-1, maxval=1)
    dirs = jax.random.normal(key, (3, P))
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)

    print("== trunk kernel ==")
    for tile in (2048, 4096, 8192, 16384):
        f = jax.jit(lambda p, d, t=tile: fused_nerf_apply_t(
            *packed, p, d, tile=t))
        try:
            dt = timeit(f, pts, dirs)
            print(f"  tile {tile:6d}: {P/dt/1e6:7.1f} Mpts/s")
        except Exception as e:
            print(f"  tile {tile:6d}: FAILED {type(e).__name__}")

    field = StyleFieldConfig(style_d=8, width=256, latent_dim=32,
                             embed_dim=nerf_cfg.input_ch)
    _, pcat, _, psty = make_style_mlps(field, jax.random.fold_in(key, 1))
    spacked = pack_style_params(state.params_coarse, pcat, psty)
    lat = jax.random.normal(jax.random.fold_in(key, 2), (32, P))

    print("== style kernel ==")
    for tile in (1024, 2048, 4096, 8192):
        f = jax.jit(lambda p, l, t=tile: fused_style_apply_t(
            *spacked, p, l, tile=t))
        try:
            dt = timeit(f, pts, lat)
            print(f"  tile {tile:6d}: {P/dt/1e6:7.1f} Mpts/s")
        except Exception as e:
            print(f"  tile {tile:6d}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
