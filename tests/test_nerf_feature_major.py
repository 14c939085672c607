"""Feature-major XLA trunk (nerf_apply_t) parity — forward and gradients
must match the flax point-major path (relu configs exactly; SIREN forward
only — its untrained gradients reach 1e13 where f32 summation order
dominates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.models.nerf import NerfConfig, make_nerf, nerf_apply, nerf_apply_t


@pytest.mark.parametrize("cfg", [
    NerfConfig(compute_dtype=jnp.float32),
    NerfConfig(depth=4, width=64, embed_freq_coor=6, embed_freq_dir=2,
               skips=(2,), compute_dtype=jnp.float32),
    NerfConfig(use_viewdir=True, compute_dtype=jnp.float32),
])
@pytest.mark.slow
def test_forward_and_grad_parity(cfg):
    model, params = make_nerf(cfg, jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    ref = nerf_apply(model, params, pts, dirs)
    out = nerf_apply_t(cfg, params, pts.T, dirs.T)
    np.testing.assert_allclose(np.asarray(out["rgb"].T),
                               np.asarray(ref["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["sigma"]),
                               np.asarray(ref["sigma"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["base_remap"].T),
                               np.asarray(ref["base_remap"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pts_embed"].T),
                               np.asarray(ref["pts_embed"]), atol=1e-6)

    g1 = jax.grad(lambda p: jnp.sum(nerf_apply(model, p, pts, dirs)["rgb"]))(
        params)
    g2 = jax.grad(lambda p: jnp.sum(nerf_apply_t(cfg, p, pts.T, dirs.T)["rgb"]))(
        params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_siren_forward_parity():
    """Shallow SIREN only: sin(30·) composed 8 deep is a chaotic map where
    f32 summation-order noise amplifies to O(1) — pointwise comparison is
    ill-conditioned at depth 8 regardless of implementation."""
    cfg = NerfConfig(depth=2, width=32, act_type="sine", skips=(),
                     compute_dtype=jnp.float32)
    model, params = make_nerf(cfg, jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    ref = nerf_apply(model, params, pts, dirs)
    out = nerf_apply_t(cfg, params, pts.T, dirs.T)
    np.testing.assert_allclose(np.asarray(out["rgb"].T),
                               np.asarray(ref["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["sigma"]),
                               np.asarray(ref["sigma"]), atol=1e-3)
