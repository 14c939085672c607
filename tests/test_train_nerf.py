"""Phase-A trainer tests: jitted train step, multi-device sharding, and a
tiny end-to-end overfit (the reference has no tests — SURVEY.md §4 — so this
pyramid is new)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig
from tgtc.train.nerf_trainer import (
    NerfTrainConfig,
    init_state,
    make_render_fn,
    make_train_step,
    render_image,
)

TINY_NERF = NerfConfig(depth=2, width=32, embed_freq_coor=4, embed_freq_dir=2,
                       compute_dtype=jnp.float32)
TINY_TRAIN = NerfTrainConfig(batch_size=256, n_samples=8, n_samples_fine=8,
                             sigma_noise_std=0.0, lrate=5e-3)


def _toy_rays(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rays_d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # target color depends deterministically on direction
    rgb = (rays_d * 0.5 + 0.5).astype(np.float32)
    return jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(rgb)


class TestTrainStep:
    def test_step_runs_and_improves(self, cpu_mesh8):
        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        step = make_train_step(cm, fm, TINY_TRAIN, mesh=cpu_mesh8)
        ro, rd, rgb = _toy_rays()
        key = jax.random.PRNGKey(1)
        state, m0 = step(state, ro, rd, rgb, key)
        for _ in range(60):
            state, m = step(state, ro, rd, rgb, key)
        assert float(m["loss"]) < float(m0["loss"])
        assert int(state.step) == 61
        assert np.isfinite(float(m["psnr_fine"]))

    @pytest.mark.slow
    def test_k_step_scan_matches_sequential(self):
        """One K=4 dispatch must be bit-identical to 4 sequential steps —
        the key schedule folds state.step inside the body (the Phase-A
        pipeline loop relies on this, mirroring Phase E)."""
        cm, fm, s1 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        _, _, s2 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        step = make_train_step(cm, fm, TINY_TRAIN)
        chunk = make_train_step(cm, fm, TINY_TRAIN, k_steps=4)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(7)
        seq_losses = []
        for _ in range(4):
            s1, m = step(s1, ro, rd, rgb, k)
            seq_losses.append(float(m["loss"]))
        s2, ms = chunk(s2, ro, rd, rgb, k)
        np.testing.assert_array_equal(np.asarray(ms["loss"]),
                                      np.asarray(seq_losses, np.float32))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params_fine, s2.params_fine,
        )
        assert int(s2.step) == 4

    @pytest.mark.slow
    def test_k_step_scan_under_mesh_matches_sequential(self, cpu_mesh8):
        """THE PRODUCTION DISPATCH SHAPE: K>1 lax.scan steps per dispatch
        *with* data-axis sharding (pipeline.train_nerf runs K=50 + mesh on
        TPU). Bit-identity vs K sequential mesh steps, plus queued
        dispatches (the pipeline keeps several chunks in flight) — the
        round-2 'in-process collectives deadlock' no longer reproduces on
        this jax, so the config is testable off-chip."""
        cm, fm, s1 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        _, _, s2 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        step = make_train_step(cm, fm, TINY_TRAIN, mesh=cpu_mesh8)
        chunk = make_train_step(cm, fm, TINY_TRAIN, mesh=cpu_mesh8,
                                k_steps=4)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(7)
        seq_losses = []
        for _ in range(8):
            s1, m = step(s1, ro, rd, rgb, k)
            seq_losses.append(float(m["loss"]))
        # two K=4 dispatches queued back-to-back without an intermediate
        # sync (dispatch window > 1, like the TPU loop)
        s2, ms_a = chunk(s2, ro, rd, rgb, k)
        s2, ms_b = chunk(s2, ro, rd, rgb, k)
        got = np.concatenate([np.asarray(ms_a["loss"]),
                              np.asarray(ms_b["loss"])])
        np.testing.assert_array_equal(got,
                                      np.asarray(seq_losses, np.float32))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params_fine, s2.params_fine,
        )
        assert int(s2.step) == 8

    def test_deterministic_given_key(self):
        cm, fm, s1 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        _, _, s2 = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        step = make_train_step(cm, fm, TINY_TRAIN)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(7)
        s1, m1 = step(s1, ro, rd, rgb, k)
        s2, m2 = step(s2, ro, rd, rgb, k)
        assert float(m1["loss"]) == float(m2["loss"])

    def test_render_image_blocks_match_single(self, cpu_mesh8):
        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        render_fn = make_render_fn(cm, fm, TINY_TRAIN, mesh=cpu_mesh8)
        ro, rd, _ = _toy_rays(n=600)
        out_blocked = render_image(
            render_fn, state.params_coarse, state.params_fine, ro, rd, block=256
        )
        out_once = render_image(
            render_fn, state.params_coarse, state.params_fine, ro, rd, block=600
        )
        np.testing.assert_allclose(
            np.asarray(out_blocked["rgb"]), np.asarray(out_once["rgb"]),
            atol=1e-5,
        )

    def test_batch_is_sharded_over_mesh(self, cpu_mesh8):
        """The gathered ray batch must actually shard over the data axis."""
        from tgtc.parallel import data_sharding

        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, TINY_TRAIN)
        ro, rd, rgb = _toy_rays(n=1024)
        shard = data_sharding(cpu_mesh8, 2)
        ro_s = jax.device_put(ro, shard)
        assert len(ro_s.sharding.device_set) == 8
        # and a sharded render executes correctly
        render_fn = make_render_fn(cm, fm, TINY_TRAIN, mesh=cpu_mesh8)
        out = render_fn(state.params_coarse, state.params_fine, ro_s,
                        jax.device_put(rd, shard))
        assert out["rgb"].shape == (1024, 3)
