"""Step-level tests for the Phase-C trainers (transformer pretrain, temporal
decoder finetune) and the VAE trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.stytrans import make_stytrans
from tgtc.models.transformer import TransformerConfig
from tgtc.models.vae import VaeConfig
from tgtc.train.temporal import (
    TemporalTrainConfig,
    make_temporal_train_step,
    sample_patch,
)
from tgtc.train.transformer2d import (
    TransformerTrainConfig,
    init_transformer_train,
    lr_schedule,
    make_transformer_train_step,
)
from tgtc.train.vae_trainer import (
    VaeTrainConfig,
    init_vae_train,
    make_vae_train_step,
)

TINY = TransformerConfig(d_model=32, nhead=2, num_encoder_layers=1,
                         num_decoder_layers=1, dim_feedforward=32,
                         dropout=0.0)


@pytest.fixture()
def net():
    # fresh params per test: the jitted steps donate their state buffers,
    # which would delete a shared fixture's arrays
    return make_stytrans(jax.random.PRNGKey(0), TINY, image_size=32)


class TestLrSchedule:
    def test_warmup_then_decay(self):
        cfg = TransformerTrainConfig()
        fn = lr_schedule(cfg)
        assert float(fn(0)) == pytest.approx(5e-5)
        assert float(fn(100)) > float(fn(0))          # warms up
        assert float(fn(20000)) < float(fn(10000))    # decays


class TestTransformerTrain:
    @pytest.mark.slow
    def test_only_transformer_and_embedding_update(self, net):
        model, params = net
        cfg = TransformerTrainConfig()
        state = init_transformer_train(params, cfg)
        step = make_transformer_train_step(model, cfg)
        c = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        s = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))

        def first_leaf(p, key):
            return np.asarray(jax.tree.leaves(p["params"][key])[0]).copy()

        # snapshot BEFORE the (donating) step deletes the input buffers
        before = {k: first_leaf(params, k)
                  for k in ["vgg", "decode", "transformer", "embedding"]}
        state2, m = step(state, c, s, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"]))

        np.testing.assert_array_equal(
            first_leaf(state2.params, "vgg"), before["vgg"]
        )
        np.testing.assert_array_equal(
            first_leaf(state2.params, "decode"), before["decode"]
        )
        assert not np.allclose(
            first_leaf(state2.params, "transformer"), before["transformer"]
        )
        assert not np.allclose(
            first_leaf(state2.params, "embedding"), before["embedding"]
        )

    @pytest.mark.slow
    def test_uint8_batches_bitwise_match_f32(self, net):
        """uint8 batches (the production prefetcher output since round 3)
        divide by 255 ON DEVICE — same values as the f32 path; XLA may
        fuse the divide differently, so equality is up to fusion-level
        rounding (measured ~1e-7 relative)."""
        model, params = net
        cfg = TransformerTrainConfig()
        step = make_transformer_train_step(model, cfg)
        rng = np.random.default_rng(0)
        c8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        s8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        k = jax.random.PRNGKey(3)
        # build both states before stepping: the step donates its state
        st1 = init_transformer_train(jax.tree.map(jnp.copy, params), cfg)
        st2 = init_transformer_train(jax.tree.map(jnp.copy, params), cfg)
        _, m8 = step(st1, jnp.asarray(c8), jnp.asarray(s8), k)
        _, mf = step(st2, jnp.asarray(c8, jnp.float32) / 255.0,
                     jnp.asarray(s8, jnp.float32) / 255.0, k)
        a, b = float(m8["loss"]), float(mf["loss"])
        assert abs(a - b) / max(abs(b), 1e-9) < 1e-5, (a, b)

    @pytest.mark.slow
    def test_loss_decreases_overfit(self, net):
        model, params = net
        cfg = TransformerTrainConfig()
        state = init_transformer_train(params, cfg)
        step = make_transformer_train_step(model, cfg)
        c = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        s = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        first = None
        for i in range(12):
            state, m = step(state, c, s, jax.random.PRNGKey(0))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first


class TestTemporalTrain:
    @pytest.mark.slow
    def test_step_runs_decoder_only(self, net):
        from tgtc.ops.rasterize import llff_projection_matrix
        from tgtc.train.transformer2d import init_transformer_train as init2

        model, params = net
        h = w = 32
        cfg = TemporalTrainConfig(batch_size=2, patch=16)
        proj = jnp.asarray(llff_projection_matrix(h, w, 30.0))
        step = make_temporal_train_step(model, cfg, proj, h, w,
                                        is_ndc=False, focal=30.0)
        state = init2(params, TransformerTrainConfig(lr=cfg.lr),
                      train_keys=("decode",))
        key = jax.random.PRNGKey(0)
        content = jax.random.uniform(key, (2, 16, 16, 3))
        # plausible world coords in front of camera
        coor = jax.random.uniform(key, (2, 16, 16, 3)) * 0.4 - jnp.array(
            [0.2, 0.2, 2.5]
        )
        cps = jnp.stack([jnp.eye(4)] * 2)
        style = jax.random.uniform(key, (2, 16, 16, 3))

        def first_leaf(p, key_):
            return np.asarray(jax.tree.leaves(p["params"][key_])[0]).copy()

        before = {k: first_leaf(params, k) for k in ["decode", "transformer"]}
        state2, m = step(state, content, coor, cps, style, (4, 4), key)
        for k in ["loss", "loss_t", "loss_c", "loss_s"]:
            assert np.isfinite(float(m[k])), k

        assert not np.allclose(
            first_leaf(state2.params, "decode"), before["decode"]
        )
        np.testing.assert_array_equal(
            first_leaf(state2.params, "transformer"), before["transformer"]
        )

    def test_sample_patch_bounds(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            y, x = sample_patch(rng, 100, 120, 32)
            assert 0 <= y <= 68 and 0 <= x <= 88
        assert sample_patch(rng, 32, 32, 64) == (0, 0)


class TestVaeTrain:
    def test_loss_decreases(self):
        cfg = VaeConfig(data_dim=16, latent_dim=4, width=16, depth=2)
        tcfg = VaeTrainConfig(lr=1e-2)
        model, state = init_vae_train(jax.random.PRNGKey(0), cfg, tcfg)
        step = make_vae_train_step(model, tcfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        first = None
        for _ in range(30):
            state, m = step(state, x, jax.random.PRNGKey(2))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first
