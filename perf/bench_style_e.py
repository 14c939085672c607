"""Phase-E (3D style distillation) training throughput: steps/s at the
reference schedule's shapes (256 rays x 2 streams, 64+64 samples, full
D8/W256 trunk + style field; /root/reference/configs/fern.txt:15,23-24).

    python perf/bench_style_e.py

Measures the single-step dispatch path and the K-step lax.scan path
(k_steps=50, what the pipeline uses on TPU). Round-2 baseline: ~20
steps/s, dispatch-latency-bound.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.data.style_dataset import synthetic_style_scene
from tgtc.models.nerf import NerfConfig, make_nerf
from tgtc.models.style_field import StyleFieldConfig
from tgtc.train.style3d import (
    StyleTrainConfig, init_style_state, make_style_train_step,
)


def build():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(0)
        nerf_cfg = NerfConfig()  # D=8, W=256
        ncm, npc = make_nerf(nerf_cfg, key)
        nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
        # scene arrays only feed gathers; size them small but real
        data = synthetic_style_scene(key, s=2, f=24, h=189, w=252)
        cfg = StyleTrainConfig(batch_size=256, n_samples=64,
                               n_samples_fine=64, origin_step=0,
                               coh_until_step=1 << 30)
        field = StyleFieldConfig(embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 24)
    dev = jax.devices()[0]
    npc, npf, data, state = jax.device_put((npc, npf, data, state), dev)
    return ncm, nfm, npc, npf, cm, sm, cfg, data, state


def measure(step_fn, state, data, key, n_calls, steps_per_call):
    state, m = step_fn(state, data, key)
    last = jax.tree.map(lambda x: x[-1] if x.ndim else x, m)
    float(np.asarray(last["loss"]))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step_fn(state, data, key)
    last = jax.tree.map(lambda x: x[-1] if x.ndim else x, m)
    float(np.asarray(last["loss"]))  # sync the whole chain
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call / dt, state


def main():
    ncm, nfm, npc, npf, cm, sm, cfg, data, state = build()
    key = jax.random.PRNGKey(1)
    state2 = jax.tree.map(jnp.copy, state)

    single = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)
    r1, _ = measure(single, state, data, key, 60, 1)

    k = 50
    scan = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg, k_steps=k)
    rk, _ = measure(scan, state2, data, key, 8, k)

    print(json.dumps({
        "metric": "style_train_steps_per_sec",
        "single_step": round(r1, 1),
        "scan_k50": round(rk, 1),
        "unit": "steps/s",
    }))


if __name__ == "__main__":
    main()
