"""Shared coarse proposal (render.fast ``coarse_share``).

The coarse pass of the plain fused render exists only to steer fine
sampling; ``coarse_share=N`` evaluates it on every N-th ray and shares the
resulting depth set across each group of N consecutive rays (scanline
neighbors at render time). Opt-in, default off — the reference evaluates
the coarse net on every ray (/root/reference/rendering.py:27-36).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgtc.ops.pallas.nerf_mlp import pack_nerf_params
from tgtc.render.fast import FusedNerfRenderer, make_fused_render_fn
from tgtc.render.volume import RenderSettings

DIMS = dict(depth=2, num_freq_coor=4, num_freq_dir=2, width=32)
KW = dict(tile=16, interpret=True, coarse_rgb=False, **DIMS)
SETTINGS = RenderSettings(n_samples=4, n_samples_fine=4, sigma_noise_std=0.0)


def _packed(key):
    from tgtc.models.nerf import NerfConfig
    from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

    cfg = NerfConfig(depth=DIMS["depth"], width=DIMS["width"],
                     embed_freq_coor=DIMS["num_freq_coor"],
                     embed_freq_dir=DIMS["num_freq_dir"],
                     compute_dtype=jnp.float32)
    _, _, state = init_state(key, cfg, NerfTrainConfig())
    pkw = dict(depth=cfg.depth, num_freq_coor=cfg.embed_freq_coor,
               num_freq_dir=cfg.embed_freq_dir, width=cfg.width)
    return (pack_nerf_params(state.params_coarse, **pkw),
            pack_nerf_params(state.params_fine, **pkw))


def _rays(key, n):
    ko, kd = jax.random.split(key)
    ro = jax.random.uniform(ko, (n, 3))
    rd = jax.random.normal(kd, (n, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


@pytest.mark.parametrize("fine_budget", [None, 6])
def test_duplicated_groups_bitwise_equal(fine_budget):
    """When every group's rays are identical, sharing the proposal changes
    nothing — share=N must reproduce share=1 exactly (the rigorous
    indexing/broadcast check)."""
    pc, pf = _packed(jax.random.PRNGKey(0))
    ro1, rd1 = _rays(jax.random.PRNGKey(1), 32)
    # duplicate each ray -> groups of 2 identical rays, 64 total
    ro = jnp.repeat(ro1, 2, axis=0)
    rd = jnp.repeat(rd1, 2, axis=0)

    exact = make_fused_render_fn(SETTINGS, fine_budget=fine_budget, **KW)(
        *pc, *pf, ro, rd)
    shared = make_fused_render_fn(
        SETTINGS, fine_budget=fine_budget, coarse_share=2, **KW)(
        *pc, *pf, ro, rd)
    for k in exact:
        np.testing.assert_array_equal(np.asarray(exact[k]),
                                      np.asarray(shared[k]), err_msg=k)


def test_neighbor_rays_close_to_exact():
    """Pixel-neighbor-like rays (tiny angular offsets within a group): the
    shared proposal steers sampling slightly differently but the fine pass
    integrates each ray's own field — outputs stay close on a smooth
    (random-init) field."""
    pc, pf = _packed(jax.random.PRNGKey(2))
    ro1, rd1 = _rays(jax.random.PRNGKey(3), 16)
    eps = jax.random.normal(jax.random.PRNGKey(4), (16, 4, 3)) * 1e-3
    rd = rd1[:, None, :] + eps
    rd = (rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)).reshape(64, 3)
    ro = jnp.repeat(ro1, 4, axis=0)

    exact = make_fused_render_fn(SETTINGS, **KW)(*pc, *pf, ro, rd)
    shared = make_fused_render_fn(SETTINGS, coarse_share=4, **KW)(
        *pc, *pf, ro, rd)
    diff = float(jnp.max(jnp.abs(exact["rgb"] - shared["rgb"])))
    assert diff < 0.05, diff


def test_share_one_is_default_path():
    pc, pf = _packed(jax.random.PRNGKey(5))
    ro, rd = _rays(jax.random.PRNGKey(6), 32)
    a = make_fused_render_fn(SETTINGS, **KW)(*pc, *pf, ro, rd)
    b = make_fused_render_fn(SETTINGS, coarse_share=1, **KW)(*pc, *pf, ro, rd)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_validation_errors():
    with pytest.raises(ValueError, match="coarse_rgb"):
        make_fused_render_fn(SETTINGS, coarse_share=2, tile=16,
                             interpret=True, coarse_rgb=True, **DIMS)
    with pytest.raises(ValueError, match=">= 1"):
        make_fused_render_fn(SETTINGS, coarse_share=0, **KW)
    pc, pf = _packed(jax.random.PRNGKey(7))
    ro, rd = _rays(jax.random.PRNGKey(8), 36)  # 36 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        make_fused_render_fn(SETTINGS, coarse_share=8, **KW)(*pc, *pf, ro, rd)


class TestShardedCoarseShare:
    """coarse_share under shard_map (the headline bench variant ert_cs,
    bench.py): shard boundaries must never land mid-group."""

    @pytest.mark.parametrize("fine_budget", [None, 6])
    def test_sharded_equals_single_device(self, cpu_mesh8, fine_budget):
        """With each shard's local ray count a multiple of coarse_share,
        proposal groups align with shard boundaries and the 8-way sharded
        render equals the single-device one exactly."""
        from tgtc.render.fast import make_sharded_fused_render_fn

        pc, pf = _packed(jax.random.PRNGKey(9))
        ro, rd = _rays(jax.random.PRNGKey(10), 8 * 32)  # 32 rays/shard
        kw = dict(KW, coarse_share=2, fine_budget=fine_budget)
        single = make_fused_render_fn(SETTINGS, **kw)(*pc, *pf, ro, rd)
        sharded = make_sharded_fused_render_fn(SETTINGS, cpu_mesh8, **kw)(
            *pc, *pf, ro, rd)
        for k in single:
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]),
                atol=1e-6, err_msg=k)

    def test_shard_boundary_mid_group_errors(self, cpu_mesh8):
        """A share that does not divide the LOCAL shard size would put a
        proposal group across two shards (silently different proposals).
        The render refuses at trace time instead. NB with the power-of-two
        tiles the production shares (2, 4) can never straddle — local
        sizes are tile multiples — so only a pathological share hits this."""
        from tgtc.render.fast import make_sharded_fused_render_fn

        pc, pf = _packed(jax.random.PRNGKey(11))
        ro, rd = _rays(jax.random.PRNGKey(12), 8 * 32)
        kw = dict(KW, coarse_share=3)  # 32 % 3 != 0
        with pytest.raises(ValueError, match="not divisible"):
            make_sharded_fused_render_fn(SETTINGS, cpu_mesh8, **kw)(
                *pc, *pf, ro, rd)


def _style_renderer(coarse_share, fine_budget=None):
    from tgtc.models.nerf import NerfConfig, make_nerf
    from tgtc.models.style_field import (
        StyleFieldConfig, init_latents, make_style_mlps,
    )
    from tgtc.render.fast_style import FusedStyleRenderer

    key = jax.random.PRNGKey(20)
    nerf_cfg = NerfConfig(depth=2, width=64, embed_freq_coor=4,
                          embed_freq_dir=2)
    _, npc = make_nerf(nerf_cfg, key)
    _, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    field = StyleFieldConfig(style_d=2, width=64, latent_dim=8,
                             embed_dim=nerf_cfg.input_ch)
    _, pc, _, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
    lat = init_latents(jax.random.fold_in(key, 3), 1, 4, 8)
    return FusedStyleRenderer.from_params(
        npc, npf, pc, ps, lat,
        RenderSettings(n_samples=4, n_samples_fine=4, sigma_noise_std=0.0),
        depth=2, num_freq_coor=4, style_d=2, style_width=64, latent_dim=8,
        trunk_width=64, tile=16, interpret=True, llff_tile=False,
        coarse_rgb=False, fine_budget=fine_budget, coarse_share=coarse_share,
    )


@pytest.mark.parametrize("fine_budget", [None, 6])
def test_style_duplicated_groups_bitwise_equal(fine_budget):
    """Stylized path: with the coarse perturbation off (key=None) and
    identical rays within each group, share=2 reproduces share=1 exactly."""
    ro1, rd1 = _rays(jax.random.PRNGKey(21), 32)
    ro = jnp.repeat(ro1, 2, axis=0)
    rd = jnp.repeat(rd1, 2, axis=0)
    sid = jnp.zeros(64, jnp.int32)
    fid = jnp.ones(64, jnp.int32)
    exact = _style_renderer(1, fine_budget).render(ro, rd, sid, fid, None)
    shared = _style_renderer(2, fine_budget).render(ro, rd, sid, fid, None)
    for k in exact:
        np.testing.assert_array_equal(np.asarray(exact[k]),
                                      np.asarray(shared[k]), err_msg=k)


def test_style_share_perturbed_runs_sane():
    """With the reference's render-time perturbation on, the shared
    proposal still yields finite in-range stylized output."""
    ro, rd = _rays(jax.random.PRNGKey(22), 64)
    sid = jnp.zeros(64, jnp.int32)
    fid = jnp.ones(64, jnp.int32)
    out = _style_renderer(4, 6).render(ro, rd, sid, fid,
                                       jax.random.PRNGKey(23))
    rgb = np.asarray(out["rgb"])
    assert rgb.shape == (64, 3) and np.isfinite(rgb).all()
    assert np.all((rgb >= 0.0) & (rgb <= 1.0))


def test_style_validation_errors():
    from tgtc.render.fast_style import make_fused_style_render_fn

    with pytest.raises(ValueError, match="coarse_rgb"):
        make_fused_style_render_fn(SETTINGS, coarse_share=2, coarse_rgb=True)
    with pytest.raises(ValueError, match=">= 1"):
        make_fused_style_render_fn(SETTINGS, coarse_share=0,
                                   coarse_rgb=False)


def test_renderer_wrapper_threads_flag():
    from tgtc.models.nerf import NerfConfig
    from tgtc.train.nerf_trainer import NerfTrainConfig, init_state

    cfg = NerfConfig(depth=DIMS["depth"], width=DIMS["width"],
                     embed_freq_coor=DIMS["num_freq_coor"],
                     embed_freq_dir=DIMS["num_freq_dir"],
                     compute_dtype=jnp.float32)
    _, _, state = init_state(jax.random.PRNGKey(9), cfg, NerfTrainConfig())
    rend = FusedNerfRenderer.from_params(
        state.params_coarse, state.params_fine, SETTINGS, tile=16,
        interpret=True, coarse_rgb=False, coarse_share=2, **DIMS)
    ro1, rd1 = _rays(jax.random.PRNGKey(10), 16)
    ro = jnp.repeat(ro1, 2, axis=0)
    rd = jnp.repeat(rd1, 2, axis=0)
    out = rend.render(ro, rd)
    assert np.isfinite(np.asarray(out["rgb"])).all()
