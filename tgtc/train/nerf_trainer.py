"""Phase A — NeRF pretraining (reference ``Origin_train``,
/root/reference/train_tgtcs.py:218-309), rebuilt TPU-first:

* ONE jitted, buffer-donated ``train_step``: index sampling, ray gather,
  coarse+fine render, loss, grads, and the optax update all fuse into a
  single XLA program (the reference pays a host→device copy and a python
  ``batchify`` loop every step).
* The full ray dataset lives in HBM; batches are ``jax.random.randint``
  gathers — the reference's per-ray ``Dataset.__getitem__`` numpy indexing
  (a documented host bottleneck, SURVEY.md §7) disappears.
* Learning rate: continuous exponential decay
  ``lrate * 0.1**(step/lrate_decay)`` (/root/reference/train_tgtcs.py:272-276).
* Multi-chip: the gathered batch is sharding-constrained to the mesh's
  ``data`` axis; params replicated; XLA emits the grad psum.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from tgtc.models.nerf import NerfConfig, NerfMLP, make_nerf
from tgtc.ops.losses import img2mse, mse2psnr
from tgtc.parallel.mesh import data_sharding
from tgtc.render.volume import RenderSettings, render_rays


@dataclasses.dataclass(frozen=True)
class NerfTrainConfig:
    batch_size: int = 2048
    lrate: float = 5e-4
    lrate_decay: int = 100000  # steps for a 10x decay
    n_samples: int = 64
    n_samples_fine: int = 64
    sigma_noise_std: float = 1.0
    near: float = 0.0
    far: float = 1.0
    white_bkgd: bool = False
    steps_per_opt: int = 1  # gradient accumulation (reference flag
    #                         --steps_per_opt, /root/reference/config.py:111,
    #                         declared but never wired there — functional here)
    feature_major: bool = False  # [features, points] trunk layout (see
    #   RenderSettings.feature_major). MEASURED on TPU v5e (perf/
    #   bench_train.py, 2026-08-16): point-major 42.6 steps/s vs
    #   feature-major 27.8 — the feature-major win is inference-only
    #   (fused kernel); under grad the layout transposes dominate, so
    #   False is the deliberate training default.
    train_fine_budget: Optional[int] = None  # ERT at TRAINING time: evaluate
    #   the fine MLP (fwd AND bwd) on only the top-`budget` merged samples
    #   per ray, scored from the coarse density
    #   (ops.sampling.select_sample_budget). None (default) = bit-parity
    #   with the reference's evaluate-all training step
    #   (/root/reference/train_tgtcs.py:228-251, utils.py:354-386).
    #   Gradients flow only through kept samples (the selector is
    #   stop_gradient'd). Meant to be STEP-SCHEDULED by the caller (exact
    #   early, tighter as density converges — the pipeline parses
    #   --train_fine_budget "96@60000,80@90000" and rebuilds the step per
    #   segment): budget quality is a function of density convergence
    #   (BASELINE.md round-4 sweep: budget 80 is -0.01 dB at 100k steps but
    #   +1.5 dB at 3k). Renders are unaffected (render_settings passes it
    #   only for perturb=True, the training call).

    def render_settings(self, perturb: bool) -> RenderSettings:
        return RenderSettings(
            n_samples=self.n_samples,
            n_samples_fine=self.n_samples_fine,
            near=self.near,
            far=self.far,
            sigma_noise_std=self.sigma_noise_std if perturb else 0.0,
            white_bkgd=self.white_bkgd,
            perturb=perturb,
            feature_major=self.feature_major,
            fine_budget=self.train_fine_budget if perturb else None,
        )


class NerfTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_coarse: Any
    params_fine: Any
    opt_state: Any


def make_optimizer(cfg: NerfTrainConfig) -> optax.GradientTransformation:
    schedule = lambda step: cfg.lrate * (0.1 ** (step / cfg.lrate_decay))
    # Adam(betas=.9/.999) parity: /root/reference/train_tgtcs.py:39
    tx = optax.adam(learning_rate=schedule)
    if cfg.steps_per_opt > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.steps_per_opt)
    return tx


def init_state(
    key: jax.Array, nerf_cfg: NerfConfig, train_cfg: NerfTrainConfig,
    fine_cfg: Optional[NerfConfig] = None,
) -> Tuple[NerfMLP, NerfMLP, NerfTrainState]:
    """``fine_cfg`` lets the fine network use its own depth/width — the
    reference selects ``netdepth_fine``/``netwidth_fine`` for mode='fine'
    (/root/reference/models.py:202-205). Defaults to ``nerf_cfg``."""
    k1, k2 = jax.random.split(key)
    coarse_model, params_c = make_nerf(nerf_cfg, k1)
    fine_model, params_f = make_nerf(fine_cfg or nerf_cfg, k2)
    tx = make_optimizer(train_cfg)
    opt_state = tx.init({"coarse": params_c, "fine": params_f})
    state = NerfTrainState(
        step=jnp.zeros((), jnp.int32),
        params_coarse=params_c,
        params_fine=params_f,
        opt_state=opt_state,
    )
    return coarse_model, fine_model, state


def _maybe_scan_steps(step_fn, k_steps: int):
    """Wrap a ``(state, rays_o, rays_d, rgb_gt, key)`` step body in a
    ``lax.scan`` over K steps per dispatch. The per-step key folds
    ``state.step`` INSIDE the body, so a K-scan with one key is
    bit-identical to K sequential calls with that key (same property the
    Phase-E scan asserts in tests/test_style3d.py). Metrics come back
    stacked ``[K]``."""
    if k_steps == 1:
        return jax.jit(step_fn, donate_argnums=(0,))

    def scan_fn(state, rays_o, rays_d, rgb_gt, key):
        def body(st, _):
            return step_fn(st, rays_o, rays_d, rgb_gt, key)

        return jax.lax.scan(body, state, None, length=k_steps)

    return jax.jit(scan_fn, donate_argnums=(0,))


def make_train_step(
    coarse_model: NerfMLP,
    fine_model: NerfMLP,
    train_cfg: NerfTrainConfig,
    mesh: Optional[Mesh] = None,
    k_steps: int = 1,
):
    """Build the jitted Phase-A train step.

    The returned function has signature
    ``(state, rays_o [T,3], rays_d [T,3], rgb_gt [T,3], key) -> (state, metrics)``
    where T is the full dataset size; batch indices are drawn inside.
    With ``k_steps > 1`` one dispatch runs K steps via ``lax.scan``
    (metrics stacked ``[K]``) — the single-step dispatch path costs
    ~4 ms/step of host/tunnel latency at Phase-A shapes.
    """
    tx = make_optimizer(train_cfg)
    settings = train_cfg.render_settings(perturb=True)

    def step_fn(state: NerfTrainState, rays_o, rays_d, rgb_gt, key):
        k_idx, k_render = jax.random.split(jax.random.fold_in(key, state.step))
        idx = jax.random.randint(
            k_idx, (train_cfg.batch_size,), 0, rays_o.shape[0]
        )
        b_o, b_d, b_rgb = rays_o[idx], rays_d[idx], rgb_gt[idx]
        if mesh is not None:
            shard = data_sharding(mesh, 2)
            b_o = jax.lax.with_sharding_constraint(b_o, shard)
            b_d = jax.lax.with_sharding_constraint(b_d, shard)
            b_rgb = jax.lax.with_sharding_constraint(b_rgb, shard)

        def loss_fn(params):
            out = render_rays(
                coarse_model,
                params["coarse"],
                fine_model,
                params["fine"],
                b_o,
                b_d,
                settings,
                key=k_render,
            )
            loss_c = img2mse(out["coarse"].rgb, b_rgb)
            loss_f = img2mse(out["fine"].rgb, b_rgb)
            return loss_c + loss_f, (loss_c, loss_f)

        params = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, (loss_c, loss_f)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = NerfTrainState(
            step=state.step + 1,
            params_coarse=params["coarse"],
            params_fine=params["fine"],
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss,
            "loss_coarse": loss_c,
            "loss_fine": loss_f,
            "psnr": mse2psnr(loss_c),
            "psnr_fine": mse2psnr(loss_f),
        }
        return new_state, metrics

    return _maybe_scan_steps(step_fn, k_steps)


def make_render_fn(
    coarse_model: NerfMLP,
    fine_model: NerfMLP,
    train_cfg: NerfTrainConfig,
    mesh: Optional[Mesh] = None,
):
    """Jitted full-precision render of a flat ray block (no noise/perturb).

    Callers pad the ray count to a multiple of (devices * 128) and shard the
    block over the ``data`` axis — this replaces the reference's ``batchify``
    chunk loop (/root/reference/utils.py:435-456).
    """
    settings = train_cfg.render_settings(perturb=False)

    def render_fn(params_coarse, params_fine, rays_o, rays_d):
        if mesh is not None:
            shard = data_sharding(mesh, 2)
            rays_o = jax.lax.with_sharding_constraint(rays_o, shard)
            rays_d = jax.lax.with_sharding_constraint(rays_d, shard)
        out = render_rays(
            coarse_model, params_coarse, fine_model, params_fine,
            rays_o, rays_d, settings, key=None,
        )
        return {
            "rgb": out["fine"].rgb,
            "rgb_coarse": out["coarse"].rgb,
            "t_exp": out["fine"].t_exp,
            "acc": out["fine"].acc,
        }

    return jax.jit(render_fn)


def render_image(
    render_fn,
    params_coarse,
    params_fine,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    block: int = 65536,
) -> Dict[str, jnp.ndarray]:
    """Render an arbitrary number of rays by fixed-size blocks (static shapes
    → one compile), padding the tail block."""
    n = rays_o.shape[0]
    outs = []
    for start in range(0, n, block):
        end = min(start + block, n)
        bo, bd = rays_o[start:end], rays_d[start:end]
        if end - start < block:
            pad = block - (end - start)
            bo = jnp.concatenate([bo, jnp.zeros((pad, 3), bo.dtype)], axis=0)
            bd = jnp.concatenate([bd, jnp.ones((pad, 3), bd.dtype)], axis=0)
        out = render_fn(params_coarse, params_fine, bo, bd)
        outs.append(jax.tree.map(lambda x: x[: end - start], out))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def make_fused_train_step(
    nerf_cfg: NerfConfig,
    train_cfg: NerfTrainConfig,
    mesh: Optional[Mesh] = None,
    tile: int = 1024,
    fine_cfg: Optional[NerfConfig] = None,
    k_steps: int = 1,
):
    """Phase-A train step on the fused Pallas trunk with the custom-VJP
    backward kernel (tgtc.ops.pallas.nerf_mlp_grad) — forward AND backward
    keep activations in VMEM instead of round-tripping [points, 256]
    tensors through HBM (the XLA path's bound, ~53 TFLOP/s).

    Same signature/semantics as :func:`make_train_step`. Requires
    batch_size × n_samples and batch_size × (n_samples + n_samples_fine)
    to be multiples of ``tile``, and the default skip-4 trunk layout; the
    fine net must share the coarse dims (the kernel packs one weight
    layout and reuses it for both passes). Pass ``fine_cfg`` when the
    fine net's config differs so the check can see it.
    """
    if not fused_train_supported(nerf_cfg, fine_cfg, train_cfg, tile=tile):
        raise ValueError(
            "make_fused_train_step preconditions not met (relu trunk, "
            "use_viewdir, skips=(4,), fine dims == coarse dims, point "
            "counts divisible by tile) — check fused_train_supported() "
            "before calling, or use make_train_step()."
        )
    from tgtc.ops.pallas.nerf_mlp_grad import (
        make_diff_apply,
        pack_nerf_params_traceable,
    )
    from tgtc.render.fast import _points_t
    from tgtc.ops.composite import alpha_composite
    from tgtc.ops.sampling import (
        merge_and_resample_fine,
        sample_along_rays_uniform,
        select_sample_budget,
    )

    tx = make_optimizer(train_cfg)
    s = train_cfg
    budget = s.train_fine_budget
    if budget is not None:
        m = s.n_samples + s.n_samples_fine
        if not 0 < budget <= m:
            raise ValueError(f"train_fine_budget {budget} not in (0, {m}]")
        if (s.batch_size * budget) % tile:
            raise ValueError(
                f"train_fine_budget {budget}: batch_size*budget "
                f"({s.batch_size * budget}) must be a multiple of tile {tile}"
            )
    nfc, nfd = nerf_cfg.embed_freq_coor, nerf_cfg.embed_freq_dir
    skip = nerf_cfg.skips[0] if nerf_cfg.skips else nerf_cfg.depth + 1
    apply_c = make_diff_apply(nerf_cfg.depth, skip, nfc, nfd,
                              nerf_cfg.width, tile=tile)

    def pack(p, depth, width):
        return pack_nerf_params_traceable(p, depth, nfc, nfd, skip, width)

    def run_pass(apply, packed, rays_o, rays_d, ts, k_noise, deltas=None):
        r, n = ts.shape
        pt, dt = _points_t(rays_o, rays_d, ts)
        rgb_t, sigma_t = apply(*packed, pt, dt)
        rgb = rgb_t.reshape(3, r, n).transpose(1, 2, 0)
        sigma = sigma_t.reshape(r, n)
        comp = alpha_composite(rgb, sigma, ts,
                               noise_std=s.sigma_noise_std, key=k_noise,
                               white_bkgd=s.white_bkgd, deltas=deltas)
        return comp, sigma

    def step_fn(state: NerfTrainState, rays_o, rays_d, rgb_gt, key):
        k_idx, k_render = jax.random.split(jax.random.fold_in(key, state.step))
        idx = jax.random.randint(k_idx, (s.batch_size,), 0, rays_o.shape[0])
        b_o, b_d, b_rgb = rays_o[idx], rays_d[idx], rgb_gt[idx]
        if mesh is not None:
            shard = data_sharding(mesh, 2)
            b_o = jax.lax.with_sharding_constraint(b_o, shard)
            b_d = jax.lax.with_sharding_constraint(b_d, shard)
            b_rgb = jax.lax.with_sharding_constraint(b_rgb, shard)
        k_samp, k_n1, k_n2 = jax.random.split(k_render, 3)

        def loss_fn(params):
            pc = pack(params["coarse"], nerf_cfg.depth, nerf_cfg.width)
            pf = pack(params["fine"], nerf_cfg.depth, nerf_cfg.width)
            _, ts = sample_along_rays_uniform(
                b_o, b_d, s.n_samples, near=s.near, far=s.far, key=k_samp,
            )
            comp_c, sigma_c = run_pass(apply_c, pc, b_o, b_d, ts, k_n1)
            _, ts_f = merge_and_resample_fine(
                b_o, b_d, ts, comp_c.weights, s.n_samples_fine
            )
            deltas_f = None
            if budget is not None:
                # training-time ERT: score merged samples from the raw
                # (pre-noise) coarse sigma; grid= stays None — the coarse
                # grid is perturbed here (k_samp)
                ts_f, deltas_f = select_sample_budget(
                    ts_f, ts, jax.lax.stop_gradient(sigma_c), budget
                )
            comp_f, _ = run_pass(apply_c, pf, b_o, b_d, ts_f, k_n2,
                                 deltas=deltas_f)
            loss_c = img2mse(comp_c.rgb, b_rgb)
            loss_f = img2mse(comp_f.rgb, b_rgb)
            return loss_c + loss_f, (loss_c, loss_f)

        params = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, (loss_c, loss_f)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = NerfTrainState(
            step=state.step + 1,
            params_coarse=params["coarse"],
            params_fine=params["fine"],
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss, "loss_coarse": loss_c, "loss_fine": loss_f,
            "psnr": mse2psnr(loss_c), "psnr_fine": mse2psnr(loss_f),
        }
        return new_state, metrics

    return _maybe_scan_steps(step_fn, k_steps)


def parse_budget_schedule(spec: str) -> "list[Tuple[int, Optional[int]]]":
    """Parse a ``--train_fine_budget`` schedule spec into
    ``[(start_step, budget_or_None), ...]`` sorted by start step.

    Grammar: comma-separated ``BUDGET@START`` segments; a bare ``BUDGET``
    means "from step 0". Budget 0 means exact (no culling). Steps before
    the first segment run exact. Examples::

        ""                  -> [(0, None)]                    (default, bit-parity)
        "80"                -> [(0, 80)]
        "96@60000,80@90000" -> [(0, None), (60000, 96), (90000, 80)]

    The budget must TIGHTEN over the schedule (exact early, smaller later):
    quality of a given budget improves with density convergence
    (BASELINE.md round-4 sweep), so a loosening schedule is almost
    certainly a typo and is rejected.
    """
    segments: "list[Tuple[int, Optional[int]]]" = [(0, None)]
    s = (spec or "").strip()
    if not s:
        return segments
    for part in s.split(","):
        part = part.strip().lower()
        if not part:
            continue
        budget_s, _, start_s = part.partition("@")
        try:
            budget = int(budget_s)
            start = int(start_s) if start_s else 0
        except ValueError:
            raise ValueError(
                f"bad --train_fine_budget segment {part!r}: expected "
                "BUDGET or BUDGET@START with integer fields, e.g. "
                "'80' or '96@60000,80@90000'"
            ) from None
        if budget < 0 or start < 0:
            raise ValueError(
                f"bad --train_fine_budget segment {part!r}: negative values"
            )
        segments.append((start, budget or None))
    segments.sort(key=lambda p: p[0])
    if segments[1][0] == 0:
        segments = segments[1:]  # explicit step-0 segment replaces the default
    budgets = [b for _, b in segments]
    for earlier, later in zip(budgets, budgets[1:]):
        if earlier is not None and (later is None or later > earlier):
            raise ValueError(
                f"--train_fine_budget schedule must tighten (exact early, "
                f"smaller budgets later); got {spec!r}"
            )
    starts = [st for st, _ in segments]
    if len(set(starts)) != len(starts):
        raise ValueError(
            f"--train_fine_budget schedule has duplicate start steps: {spec!r}"
        )
    return segments


def budget_at_step(
    segments: "list[Tuple[int, Optional[int]]]", step: int
) -> Tuple[Optional[int], Optional[int]]:
    """Return ``(budget, next_boundary)`` for ``step`` under a parsed
    schedule. ``next_boundary`` is the first segment start strictly after
    ``step`` (None when in the last segment) — the training loop uses it to
    keep a K-step scan chunk from crossing a budget switch."""
    budget = segments[0][1]
    next_boundary = None
    for start, b in segments:
        if start <= step:
            budget = b
        else:
            next_boundary = start
            break
    return budget, next_boundary


def fused_train_supported(nerf_cfg: NerfConfig, fine_cfg: Optional[NerfConfig],
                          train_cfg: NerfTrainConfig, tile: int = 1024) -> bool:
    """Eligibility for :func:`make_fused_train_step`: default relu trunk,
    symmetric coarse/fine dims, tile-divisible point counts."""
    f = fine_cfg or nerf_cfg
    nc = train_cfg.batch_size * train_cfg.n_samples
    nf = train_cfg.batch_size * (train_cfg.n_samples + train_cfg.n_samples_fine)
    return (
        nerf_cfg.act_type == "relu"
        and nerf_cfg.use_viewdir
        and tuple(nerf_cfg.skips) == (4,)
        and f.depth == nerf_cfg.depth and f.width == nerf_cfg.width
        and nc % tile == 0 and nf % tile == 0
    )
