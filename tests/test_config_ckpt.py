"""Tests for the config system (reference config-file compat) and orbax
checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.config import Config, load_config, parse_config_file


class TestConfig:
    def test_defaults(self):
        cfg = Config()
        assert cfg.netdepth == 8 and cfg.embed_freq_coor == 10

    def test_reference_style_file(self, tmp_path):
        """Parses the reference configs/fern.txt format (key = value, bare
        flags, comments)."""
        p = tmp_path / "fern.txt"
        p.write_text(
            "expname = fern_style\n"
            "datadir = ./data/fern\n"
            "factor = 4\n"
            "batch_size = 2048 # 2048\n"
            "batch_size_style = 256 # 1024\n"
            "loss_coh_lambda = 1e2\n"
            "use_viewdir\n"
            "sigma_noise_std = 1e0\n"
            "origin_step = 120001\n"
        )
        cfg = load_config(["--config", str(p)])
        assert cfg.expname == "fern_style"
        assert cfg.factor == 4.0
        assert cfg.batch_size == 2048
        assert cfg.batch_size_style == 256
        assert cfg.loss_coh_lambda == 100.0
        assert cfg.use_viewdir is True
        assert cfg.origin_step == 120001

    def test_cli_overrides_file(self, tmp_path):
        p = tmp_path / "c.txt"
        p.write_text("factor = 4\n")
        cfg = load_config(["--config", str(p), "--factor", "8"])
        assert cfg.factor == 8.0

    def test_exp_dir_naming(self):
        cfg = Config(expname="fern", nerf_type="style_nerf", act_type="relu",
                     use_viewdir=True, factor=4.0, basedir="/logs")
        assert "fern_style_nerf_relu_ViewdirTrue_factor4.0" in cfg.exp_dir


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from tgtc.train.checkpoint import CheckpointManager

        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7),
        }
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        mgr.save(7, state)
        assert mgr.latest_step() == 7
        restored = mgr.restore(state)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
        )
        assert int(restored["step"]) == 7
        mgr.close()

    def test_retention(self, tmp_path):
        from tgtc.train.checkpoint import CheckpointManager

        state = {"x": jnp.zeros(3)}
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        for s in [1, 2, 3]:
            mgr.save(s, {"x": jnp.full(3, float(s))})
        assert mgr.latest_step() == 3
        steps = mgr._mgr.all_steps()
        assert 1 not in steps and len(steps) == 2
        mgr.close()

    def test_async_saves_overlap_and_finalize(self, tmp_path):
        """In-loop saves return without blocking on disk IO; wait()/restore
        observe every finalized step (the Phase-A loop relies on this)."""
        from tgtc.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=8)
        for s in range(5):
            mgr.save(s, {"x": jnp.full(4, float(s))})  # no wait
        mgr.save(5, {"x": jnp.full(4, 5.0)}, wait=True)
        assert mgr.latest_step() == 5
        restored = mgr.restore({"x": jnp.zeros(4)}, step=3)
        np.testing.assert_array_equal(np.asarray(restored["x"]),
                                      np.full(4, 3.0))
        mgr.close()

    def test_save_device_async_roundtrip_and_order(self, tmp_path):
        """save_device_async fetches device states on a background thread
        (the in-loop jax.device_get cost ~6.7 s through the tunneled TPU);
        wait() observes every step, values round-trip exactly, and the
        donation-safety snapshot pattern (non-donating jnp.copy) preserves
        the value even if the source buffer is mutated afterwards."""
        from tgtc.train.checkpoint import CheckpointManager

        snap = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=8)
        for s in range(5):  # exceeds the 2-deep fetch backpressure window
            mgr.save_device_async(s, snap({"x": jnp.full(4, float(s))}))
        mgr.save_device_async(5, snap({"x": jnp.full(4, 5.0)}), wait=True)
        assert mgr.latest_step() == 5
        for s in (0, 3, 5):
            restored = mgr.restore({"x": jnp.zeros(4)}, step=s)
            np.testing.assert_array_equal(np.asarray(restored["x"]),
                                          np.full(4, float(s)))
        mgr.close()

    def test_train_state_roundtrip(self, tmp_path):
        from tgtc.models.nerf import NerfConfig
        from tgtc.train.checkpoint import CheckpointManager
        from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

        cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2, embed_freq_dir=1,
                         compute_dtype=jnp.float32)
        _, _, state = init_state(jax.random.PRNGKey(0), cfg, NerfTrainConfig())
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state)
        restored = mgr.restore(state)
        chex_equal = jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.params_coarse, restored.params_coarse,
        )
        del chex_equal
        mgr.close()

    def test_actual_reference_config_files(self):
        """The unmodified reference configs/*.txt must load (file-format
        compatibility contract)."""
        import os

        ref_dir = "/root/reference/configs"
        if not os.path.isdir(ref_dir):
            import pytest

            pytest.skip("reference not mounted")
        for name in os.listdir(ref_dir):
            cfg = load_config(["--config", os.path.join(ref_dir, name)])
            assert cfg.dataset_type == "llff"
            assert cfg.batch_size == 2048
            assert cfg.N_samples == 64
            assert cfg.use_viewdir is True
            assert cfg.origin_step == 120001


def test_coh_gate_derives_from_origin_step(tmp_path, synthetic_llff_dir):
    """coh_until_step=-1 reproduces the reference's 122000 gate for the
    shipped origin_step=120001 and scales for any other origin_step."""
    from tgtc.config import Config

    cfg = Config(
        expname="g", basedir=str(tmp_path), datadir=synthetic_llff_dir,
        styledir=str(tmp_path), factor=1.0, origin_step=120001,
    )
    assert cfg.coh_until_step == -1
    assert cfg.origin_step + 1999 == 122000
