"""Worker for the 2-process multi-host test (NOT a test module).

Launched twice by tests/test_multihost.py with TGTC_COORDINATOR /
TGTC_NUM_PROCESSES / TGTC_PROCESS_ID in the environment — the same env
contract the CLI's ``maybe_initialize_distributed`` reads (the TPU-native
analog of the reference's env-rank discovery,
/root/reference/misc.py:157-179). Each process contributes 4 virtual CPU
devices; the global mesh spans 8 across both. Runs the Phase-A train step
for K steps on the toy workload from tests/test_train_nerf.py and (on
process 0) writes the final loss + a param fingerprint for the parent to
compare against the single-process result.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tgtc.parallel.distributed import (  # noqa: E402
    is_main_process,
    maybe_initialize_distributed,
    replicate_to_mesh,
)


def pipeline_main(scene_dir: str, basedir: str, out_path: str) -> None:
    """Drive the Pipeline's multi-host branch (Phase A over the global
    mesh with process-0-gated checkpoints/logs)."""
    assert maybe_initialize_distributed(), "env did not trigger init"
    assert jax.process_count() == 2

    from tgtc.config import Config
    from tgtc.parallel.distributed import is_main_process
    from tgtc.train.pipeline import Pipeline

    cfg = Config(
        expname="mh", basedir=basedir, datadir=scene_dir,
        styledir=scene_dir, factor=1.0, use_viewdir=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        embed_freq_coor=2, embed_freq_dir=1,
        N_samples=4, N_samples_fine=4,
        batch_size=128, origin_step=20, total_step=25,
        i_print=10, sigma_noise_std=0.0, use_pallas=False,
    )
    pipe = Pipeline(cfg)
    try:
        pipe.run()  # takes the multihost branch: Phase A, then guidance
        latest = pipe.nerf_ckpt.latest_step()
        # non-main process must not have written logs or checkpoints
        assert pipe.log._is_main() == is_main_process()
        if is_main_process():
            with open(out_path, "w") as f:
                json.dump({"latest_step": latest}, f)
        print(f"[worker p{jax.process_index()}] latest={latest}", flush=True)
    finally:
        pipe.close()


def main(out_path: str) -> None:
    assert maybe_initialize_distributed(), "env did not trigger init"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from tests.test_train_nerf import TINY_NERF, TINY_TRAIN, _toy_rays
    from tgtc.parallel import get_mesh
    from tgtc.train.nerf_trainer import init_state, make_train_step

    mesh = get_mesh()
    assert mesh.devices.size == 8
    cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
    state = replicate_to_mesh(mesh, state)
    ro, rd, rgb = _toy_rays()
    ro, rd, rgb = replicate_to_mesh(mesh, (ro, rd, rgb))
    step = make_train_step(cm, fm, TINY_TRAIN, mesh=mesh)
    key = jax.random.PRNGKey(7)
    for _ in range(6):
        state, m = step(state, ro, rd, rgb, key)
    loss = float(m["loss"])
    fp = float(
        sum(jnp.sum(x) for x in jax.tree.leaves(state.params_fine))
    )
    if is_main_process():
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "param_fingerprint": fp}, f)
    print(f"[worker p{jax.process_index()}] loss={loss!r}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "pipeline":
        pipeline_main(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main(sys.argv[1])
