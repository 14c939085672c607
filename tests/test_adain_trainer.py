"""AdaIN alternate decoder trainers (finetune + temporal variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.adain_net import make_adain_net
from tgtc.ops.rasterize import llff_projection_matrix
from tgtc.train.adain_trainer import (
    AdainTrainConfig,
    init_adain_train,
    make_adain_finetune_step,
    make_adain_temporal_step,
)


def _first_leaf(p, key):
    return np.asarray(jax.tree.leaves(p["params"][key])[0]).copy()


class TestAdainTrainers:
    @pytest.mark.slow
    def test_finetune_decoder_only(self):
        model, params = make_adain_net(jax.random.PRNGKey(0), image_size=32)
        cfg = AdainTrainConfig()
        state = init_adain_train(params, cfg)
        step = make_adain_finetune_step(model, cfg)
        c = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        s = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
        before = {k: _first_leaf(params, k) for k in ["decode", "vgg"]}
        state2, m = step(state, c, s)
        assert np.isfinite(float(m["loss"]))
        assert not np.allclose(_first_leaf(state2.params, "decode"),
                               before["decode"])
        np.testing.assert_array_equal(
            _first_leaf(state2.params, "vgg"), before["vgg"]
        )

    @pytest.mark.slow
    def test_temporal_variant(self):
        model, params = make_adain_net(jax.random.PRNGKey(0), image_size=16)
        cfg = AdainTrainConfig()
        h = w = 16
        proj = jnp.asarray(llff_projection_matrix(h, w, 15.0))
        step = make_adain_temporal_step(model, cfg, proj, h, w,
                                        is_ndc=False, focal=15.0)
        state = init_adain_train(params, cfg)
        key = jax.random.PRNGKey(3)
        content = jax.random.uniform(key, (2, h, w, 3))
        coor = jax.random.uniform(key, (2, h, w, 3)) * 0.4 - jnp.array(
            [0.2, 0.2, 2.5]
        )
        cps = jnp.stack([jnp.eye(4)] * 2)
        style = jax.random.uniform(key, (2, h, w, 3))
        state2, m = step(state, content, coor, cps, style)
        for k in ["loss", "loss_c", "loss_s", "loss_t"]:
            assert np.isfinite(float(m[k])), k
