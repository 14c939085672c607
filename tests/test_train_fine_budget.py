"""Training-time ERT (--train_fine_budget): step-scheduled fine-sample
budgets in the Phase-A and Phase-E train steps.

The reference evaluates the fine MLP on every merged sample in training
(/root/reference/train_tgtcs.py:228-251, utils.py:354-386); the round-4
render-time lever (ops.sampling.select_sample_budget) is here wired into the
train steps behind a step-scheduled budget (VERDICT r4 item 1). These tests
pin (a) the schedule grammar + its tightening invariant, (b) default-off /
full-budget bit-parity with the exact step, and (c) that a budgeted step
still trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig, make_nerf
from tgtc.train.nerf_trainer import (
    NerfTrainConfig,
    budget_at_step,
    init_state,
    make_train_step,
    parse_budget_schedule,
)

TINY_NERF = NerfConfig(depth=2, width=32, embed_freq_coor=4, embed_freq_dir=2,
                       compute_dtype=jnp.float32)
# fused-kernel layout constraints (skip=4 path) at tiny batch sizes
FULL_LAYOUT = NerfConfig(depth=8, width=256, embed_freq_coor=10,
                         embed_freq_dir=4, use_viewdir=True)


def _tiny_train(budget):
    return NerfTrainConfig(batch_size=128, n_samples=8, n_samples_fine=8,
                           sigma_noise_std=0.0, lrate=5e-3,
                           train_fine_budget=budget)


def _toy_rays(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rays_d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = (rays_d * 0.5 + 0.5).astype(np.float32)
    return jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(rgb)


class TestScheduleGrammar:
    def test_default_off(self):
        assert parse_budget_schedule("") == [(0, None)]
        assert parse_budget_schedule(None) == [(0, None)]

    def test_bare_budget_from_step_zero(self):
        assert parse_budget_schedule("80") == [(0, 80)]

    def test_full_schedule_with_exact_prefix(self):
        got = parse_budget_schedule("96@60000,80@90000")
        assert got == [(0, None), (60000, 96), (90000, 80)]

    def test_budget_zero_means_exact(self):
        assert parse_budget_schedule("0") == [(0, None)]
        assert parse_budget_schedule("80@100,0") == [(0, None), (100, 80)]

    def test_order_independent(self):
        assert parse_budget_schedule("80@90000,96@60000") == \
            parse_budget_schedule("96@60000,80@90000")

    @pytest.mark.parametrize("bad", [
        "80@100,96@200",   # loosens (96 after 80)
        "80,0@100",        # loosens to exact
        "abc", "80@x", "-1", "80@-5",
        "80@100,96@100",   # duplicate start
    ])
    def test_rejects_bad_specs(self, bad):
        with pytest.raises(ValueError):
            parse_budget_schedule(bad)

    def test_budget_at_step(self):
        seg = parse_budget_schedule("96@100,80@200")
        assert budget_at_step(seg, 0) == (None, 100)
        assert budget_at_step(seg, 99) == (None, 100)
        assert budget_at_step(seg, 100) == (96, 200)
        assert budget_at_step(seg, 199) == (96, 200)
        assert budget_at_step(seg, 200) == (80, None)
        assert budget_at_step(seg, 10**6) == (80, None)
        assert budget_at_step(parse_budget_schedule(""), 5) == (None, None)


class TestXlaStepBudget:
    def test_full_budget_bit_parity(self):
        """budget == n_samples + n_samples_fine keeps every sample — the
        budgeted step must be BIT-identical to the exact step (same
        guarantee tests/test_fine_budget.py pins for the fused render)."""
        tc_exact, tc_full = _tiny_train(None), _tiny_train(16)
        cm, fm, s1 = init_state(jax.random.PRNGKey(0), TINY_NERF, tc_exact)
        _, _, s2 = init_state(jax.random.PRNGKey(0), TINY_NERF, tc_full)
        step_e = make_train_step(cm, fm, tc_exact)
        step_b = make_train_step(cm, fm, tc_full)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(7)
        for _ in range(3):
            s1, m1 = step_e(s1, ro, rd, rgb, k)
            s2, m2 = step_b(s2, ro, rd, rgb, k)
        assert float(m1["loss"]) == float(m2["loss"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params_fine, s2.params_fine,
        )

    def test_budgeted_step_trains(self):
        """A real (10/16) budget still reduces loss on the toy overfit and
        the state advances — gradients flow through the kept samples."""
        tc = _tiny_train(10)
        cm, fm, state = init_state(jax.random.PRNGKey(0), TINY_NERF, tc)
        step = make_train_step(cm, fm, tc)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(1)
        state, m0 = step(state, ro, rd, rgb, k)
        for _ in range(60):
            state, m = step(state, ro, rd, rgb, k)
        assert float(m["loss"]) < float(m0["loss"])
        assert np.isfinite(float(m["psnr_fine"]))
        assert int(state.step) == 61

    def test_budget_leaves_coarse_pass_exact(self):
        """The budget culls only the FINE pass: coarse loss must be
        bit-equal between exact and budgeted steps on the same state/key
        (fresh states, single step, no optimizer divergence yet)."""
        tc_e, tc_b = _tiny_train(None), _tiny_train(6)
        cm, fm, s1 = init_state(jax.random.PRNGKey(0), TINY_NERF, tc_e)
        _, _, s2 = init_state(jax.random.PRNGKey(0), TINY_NERF, tc_b)
        ro, rd, rgb = _toy_rays()
        k = jax.random.PRNGKey(3)
        _, m1 = make_train_step(cm, fm, tc_e)(s1, ro, rd, rgb, k)
        _, m2 = make_train_step(cm, fm, tc_b)(s2, ro, rd, rgb, k)
        assert float(m1["loss_coarse"]) == float(m2["loss_coarse"])
        assert float(m1["loss_fine"]) != float(m2["loss_fine"])


class TestStyleStepBudget:
    def _setup(self, budget):
        from tgtc.data.style_dataset import synthetic_style_scene
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
                               llff_tile=False, dataset_type="synthetic",
                               fine_budget=budget)
        field = StyleFieldConfig(style_d=4, width=32, latent_dim=8,
                                 embed_dim=nerf_cfg.input_ch)
        cm, sm, state = init_style_state(key, field, cfg, 2, 3)
        step = make_style_train_step(ncm, nfm, npc, npf, cm, sm, cfg)
        return step, state, data

    def test_full_budget_bit_parity(self):
        """fine_budget == n_samples + n_samples_fine must be bit-identical
        to the exact Phase-E step."""
        step_e, s1, data = self._setup(None)
        step_b, s2, _ = self._setup(8)
        k = jax.random.PRNGKey(5)
        for _ in range(3):
            s1, m1 = step_e(s1, data, k)
            s2, m2 = step_b(s2, data, k)
        assert float(m1["loss"]) == float(m2["loss"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params["style"], s2.params["style"],
        )

    def test_budgeted_step_runs_and_finite(self):
        step, state, data = self._setup(5)
        k = jax.random.PRNGKey(5)
        losses = []
        for _ in range(6):
            state, m = step(state, data, k)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 6


class TestFusedStepBudget:
    def _fused(self, tcfg, tile=128):
        """Build the fused train step with the Pallas kernels in interpret
        mode (same pattern as tests/test_fused_grad.py)."""
        import tgtc.ops.pallas.nerf_mlp_grad as g
        from tgtc.train.nerf_trainer import make_fused_train_step

        orig = g.make_diff_apply
        try:
            g.make_diff_apply = (
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
            return make_fused_train_step(FULL_LAYOUT, tcfg, tile=tile)
        finally:
            g.make_diff_apply = orig

    def test_tile_validation(self):
        from tgtc.train.nerf_trainer import make_fused_train_step

        bad = NerfTrainConfig(batch_size=8, n_samples=16, n_samples_fine=16,
                              sigma_noise_std=0.0, train_fine_budget=10)
        with pytest.raises(ValueError, match="multiple of tile"):
            make_fused_train_step(FULL_LAYOUT, bad, tile=128)  # 8*10 % 128
        bad2 = NerfTrainConfig(batch_size=8, n_samples=16, n_samples_fine=16,
                               sigma_noise_std=0.0, train_fine_budget=33)
        with pytest.raises(ValueError, match="not in"):
            make_fused_train_step(FULL_LAYOUT, bad2, tile=128)  # > nc+nf

    @pytest.mark.slow
    def test_full_budget_bit_parity(self):
        """Fused step with budget == nc+nf must be bit-identical to the
        fused exact step (kernel problem sizes match: 8*32 = 256)."""
        tc_e = NerfTrainConfig(batch_size=8, n_samples=16, n_samples_fine=16,
                               sigma_noise_std=0.0)
        tc_b = NerfTrainConfig(batch_size=8, n_samples=16, n_samples_fine=16,
                               sigma_noise_std=0.0, train_fine_budget=32)
        _, _, s1 = init_state(jax.random.PRNGKey(0), FULL_LAYOUT, tc_e)
        _, _, s2 = init_state(jax.random.PRNGKey(0), FULL_LAYOUT, tc_b)
        step_e, step_b = self._fused(tc_e), self._fused(tc_b)
        ro, rd, rgb = _toy_rays(n=64)
        k = jax.random.PRNGKey(7)
        s1, m1 = step_e(s1, ro, rd, rgb, k)
        s2, m2 = step_b(s2, ro, rd, rgb, k)
        assert float(m1["loss"]) == float(m2["loss"])
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params_fine, s2.params_fine,
        )

    @pytest.mark.slow
    def test_budgeted_fused_trains(self):
        """16/32 budget (8*16 = 128 = tile): loss decreases and stays
        finite — the custom-VJP kernels see the culled problem size."""
        tc = NerfTrainConfig(batch_size=8, n_samples=16, n_samples_fine=16,
                             sigma_noise_std=0.0, train_fine_budget=16)
        _, _, state = init_state(jax.random.PRNGKey(0), FULL_LAYOUT, tc)
        step = self._fused(tc)
        ro, rd, rgb = _toy_rays(n=64)
        k = jax.random.PRNGKey(1)
        state, m0 = step(state, ro, rd, rgb, k)
        for _ in range(5):
            state, m = step(state, ro, rd, rgb, k)
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss"]) < float(m0["loss"])


class TestPipelineScheduleWiring:
    def test_config_field_default_off(self):
        from tgtc.config import Config

        assert Config().train_fine_budget == ""
        assert parse_budget_schedule(Config().train_fine_budget) == [(0, None)]

    def test_config_file_roundtrip(self, tmp_path):
        from tgtc.config import load_config

        p = tmp_path / "c.txt"
        p.write_text("train_fine_budget = 96@60000,80@90000\n")
        cfg = load_config(["--config", str(p)])
        assert parse_budget_schedule(cfg.train_fine_budget) == [
            (0, None), (60000, 96), (90000, 80)]
