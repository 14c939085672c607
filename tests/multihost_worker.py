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

if __name__ == "__main__":
    # worker-process backend setup; the test process imports this module
    # for the shared workload functions and must keep its own (8-device)
    # backend config
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

if __name__ == "__main__":
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


def style_workload(mesh):
    """Phase-E style step over ``mesh`` — shared by the 2-process worker
    and the in-process single-process reference (test_multihost.py), so
    both sides run literally the same code on 1×8 vs 2×4 topologies."""
    import jax.numpy as jnp

    from tgtc.data.style_dataset import synthetic_style_scene
    from tgtc.models.nerf import NerfConfig, make_nerf
    from tgtc.models.style_field import StyleFieldConfig
    from tgtc.train.style3d import (
        StyleTrainConfig, init_style_state, make_style_train_step,
    )

    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig(depth=2, width=32, embed_freq_coor=2,
                          embed_freq_dir=1, compute_dtype=jnp.float32)
    ncm, npc = make_nerf(nerf_cfg, key)
    nfm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    data = synthetic_style_scene(key, s=2, f=3, h=8, w=8)
    cfg = StyleTrainConfig(batch_size=16, n_samples=4, n_samples_fine=4,
                           sigma_noise_std=0.0, origin_step=0,
                           llff_tile=False, dataset_type="synthetic")
    field = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                             embed_dim=nerf_cfg.input_ch)
    cm, sm, state = init_style_state(key, field, cfg, 2, 3)
    state, data, npc, npf = replicate_to_mesh(mesh, (state, data, npc, npf))
    step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg, mesh=mesh)
    k = jax.random.PRNGKey(7)
    for _ in range(6):
        state, m = step(state, data, k)
    loss = float(m["loss"])
    fp = float(sum(jnp.sum(x) for x in jax.tree.leaves(state.params["style"])))
    return loss, fp


def c1_workload(mesh):
    """C1 StyTrans step over ``mesh`` — the reference's one real multi-GPU
    workload (DataParallel, /root/reference/trans_train.py:125-126), here
    batch-sharded over the global mesh."""
    import jax.numpy as jnp

    from tgtc.models.stytrans import make_stytrans
    from tgtc.models.transformer import TransformerConfig
    from tgtc.train.transformer2d import (
        TransformerTrainConfig,
        init_transformer_train,
        make_transformer_train_step,
    )

    tiny = TransformerConfig(d_model=32, nhead=2, num_encoder_layers=1,
                             num_decoder_layers=1, dim_feedforward=32,
                             dropout=0.0)
    model, params = make_stytrans(jax.random.PRNGKey(0), tiny, image_size=32)
    tcfg = TransformerTrainConfig(batch_size=8, patch=32)
    state = init_transformer_train(params, tcfg)
    content = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    style = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 3))
    state, content, style = replicate_to_mesh(mesh, (state, content, style))
    step = make_transformer_train_step(model, tcfg, mesh=mesh)
    k = jax.random.PRNGKey(3)
    for _ in range(3):
        state, m = step(state, content, style, k)
    loss = float(m["loss"])
    fp = float(sum(jnp.sum(x)
                   for x in jax.tree.leaves(state.params["params"]
                                            ["transformer"])))
    return loss, fp


def workload_main(which: str, out_path: str) -> None:
    """2-process entry for the style/c1 step-equality proofs."""
    assert maybe_initialize_distributed(), "env did not trigger init"
    assert jax.process_count() == 2, jax.process_count()

    from tgtc.parallel import get_mesh

    mesh = get_mesh()
    assert mesh.devices.size == 8
    loss, fp = (style_workload if which == "style" else c1_workload)(mesh)
    if is_main_process():
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "param_fingerprint": fp}, f)
    print(f"[worker p{jax.process_index()}] {which} loss={loss!r}",
          flush=True)


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


def all_main(scene_dir: str, basedir: str, out_path: str) -> None:
    """Run ALL four 2-process proofs in one spawn pair (one distributed
    init, one jax import): the Phase-A step, the style step, the C1 step,
    then the Pipeline Phase-A e2e. The parent asserts each piece from the
    single JSON — 4 spawn pairs collapsed into 1 (VERDICT r4 item 7)."""
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
    result = {}

    cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
    state = replicate_to_mesh(mesh, state)
    ro, rd, rgb = _toy_rays()
    ro, rd, rgb = replicate_to_mesh(mesh, (ro, rd, rgb))
    step = make_train_step(cm, fm, TINY_TRAIN, mesh=mesh)
    key = jax.random.PRNGKey(7)
    for _ in range(6):
        state, m = step(state, ro, rd, rgb, key)
    result["train"] = {
        "loss": float(m["loss"]),
        "param_fingerprint": float(
            sum(jnp.sum(x) for x in jax.tree.leaves(state.params_fine))),
    }
    print(f"[worker p{jax.process_index()}] train done", flush=True)

    for which, fn in (("style", style_workload), ("c1", c1_workload)):
        loss, fp = fn(mesh)
        result[which] = {"loss": loss, "param_fingerprint": fp}
        print(f"[worker p{jax.process_index()}] {which} done", flush=True)

    from tgtc.config import Config
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
        result["pipeline"] = {"latest_step": pipe.nerf_ckpt.latest_step()}
        assert pipe.log._is_main() == is_main_process()
        if is_main_process():
            with open(out_path, "w") as f:
                json.dump(result, f)
        print(f"[worker p{jax.process_index()}] pipeline done", flush=True)
    finally:
        pipe.close()


if __name__ == "__main__":
    if sys.argv[1] == "pipeline":
        pipeline_main(sys.argv[2], sys.argv[3], sys.argv[4])
    elif sys.argv[1] == "all":
        all_main(sys.argv[2], sys.argv[3], sys.argv[4])
    elif sys.argv[1] in ("style", "c1"):
        workload_main(sys.argv[1], sys.argv[2])
    else:
        main(sys.argv[1])
