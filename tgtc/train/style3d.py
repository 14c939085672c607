"""Phase E — 3D style-field distillation (reference ``Style_train``,
/root/reference/train_tgtcs.py:312-571), rebuilt as ONE jitted step.

Reference semantics kept:

* Two batch streams: shuffled main + coherent (same pixels, consecutive
  frames); coarse AND fine style-forward on both.
* Losses: λ_rgb·MSE (coarse+fine), decayed λ_logp·minus_logp, and the
  cross-view coherence loss
  ``‖cos(styled_t, styled_{t-1}) − cos(orig_t, orig_{t-1})‖``
  with stateful previous-batch buffers and the frame-cycle counter reset
  (/root/reference/train_tgtcs.py:396-403,451-468).
* Two optimizers: style MLPs get ``rgb+logp+λ_coh·coh`` (coh dropped past
  ``coh_until_step``, the reference's hardcoded 122000 gate at :486), the
  latent table gets ``rgb+logp`` at lr 1e-3
  (/root/reference/models.py:541-542).

TPU-native translation: the reference's double backward
(``backward(retain_graph=True)`` + ``latents.optimize``) collapses into ONE
grad of a single scalar — the coherence term is computed with
``stop_gradient`` on the latent lookup, so its gradient reaches only the
style MLPs, exactly reproducing which parameters see which loss. Optimizer
partitioning is optax ``multi_transform`` over the param subtree labels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tgtc.data.style_dataset import (
    StyleSceneData,
    advance_coh_counters,
    gather_coh_batch,
    gather_main_batch,
)
from tgtc.models.nerf import NerfMLP
from tgtc.models.style_field import (
    StyleFieldConfig,
    StyleMLPBeforeConcat,
    StyleMLPWildMultilayers,
    latent_minus_logp,
    make_style_mlps,
)
from tgtc.ops.losses import cosine_similarity, img2mse, l2_norm
from tgtc.ops.sampling import (
    merge_and_resample_fine,
    sample_along_rays_uniform,
    select_sample_budget,
)
from tgtc.render.style import style_forward


@dataclasses.dataclass(frozen=True)
class StyleTrainConfig:
    batch_size: int = 256           # reference --batch_size_style
    n_samples: int = 64
    n_samples_fine: int = 64
    near: float = 0.0
    far: float = 1.0
    sigma_noise_std: float = 1.0
    lrate: float = 5e-4
    latent_lrate: float = 1e-3
    rgb_loss_lambda: float = 1.0
    logp_loss_lambda: float = 0.1
    logp_loss_decay: float = 1.0
    loss_coh_lambda: float = 1e2    # fern config value
    sigma_scale: float = 1.0
    llff_tile: bool = True
    origin_step: int = 120001
    coh_until_step: int = 122000    # reference hardcoded gate
    dataset_type: str = "llff"
    fine_budget: Optional[int] = None  # training-time ERT for the fine
    #   stylized pass: evaluate trunk+style chain on only the top-`budget`
    #   merged samples per ray, scored from the FROZEN coarse density
    #   (ops.sampling.select_sample_budget). None = exact reference parity.
    #   Phase E always starts from a converged density (the NeRF is frozen
    #   after origin_step), so no schedule is needed here — the pipeline
    #   passes the LAST segment of --train_fine_budget.
    # Measured dynamics note (BASELINE.md): with coherence active from the
    # first step (the reference's schedule), Adam's direction is dominated
    # by the scale-invariant cosine term; on high-chroma synthetic scenes
    # this saturates the style MLP's sigmoid within ~100 steps and the
    # field never recovers (rgb 0.15→0.55 dead, vs 5e-4 with λ_coh=0).
    # Gradient-norm clipping provably cannot help (Adam is invariant to
    # gradient scale). On natural scenes the origin cosine pattern is far
    # gentler. Mitigation when it bites: lower loss_coh_lambda or shift
    # coh_until_step.


class StyleTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                     # {"concat", "style", "latents"}
    mu: jnp.ndarray                 # [S, D] frozen per-style stats
    logvar: jnp.ndarray
    opt_state: Any
    # coherence stream state
    coh_x: jnp.ndarray              # prev coarse styled rgb [B, 3]
    coh_y: jnp.ndarray              # prev fine styled rgb [B, 3]
    coh_x_origin: jnp.ndarray       # prev origin rgb [B, 3]
    cnt: jnp.ndarray
    style_start: jnp.ndarray
    frame_start: jnp.ndarray
    block: jnp.ndarray
    start: jnp.ndarray


def make_style_optimizer(cfg: StyleTrainConfig) -> optax.GradientTransformation:
    return optax.multi_transform(
        {
            "style": optax.adam(cfg.lrate),
            "latent": optax.adam(cfg.latent_lrate),
        },
        param_labels={"concat": "style", "style": "style", "latents": "latent"},
    )


def init_style_state(
    key: jax.Array,
    field_cfg: StyleFieldConfig,
    train_cfg: StyleTrainConfig,
    style_num: int,
    frame_num: int,
    latents_init: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[StyleMLPBeforeConcat, StyleMLPWildMultilayers, StyleTrainState]:
    from tgtc.models.style_field import init_latents

    k1, k2 = jax.random.split(key)
    concat_model, p_concat, style_model, p_style = make_style_mlps(field_cfg, k1)
    lat = latents_init or init_latents(
        k2, style_num, frame_num, field_cfg.latent_dim
    )
    params = {"concat": p_concat, "style": p_style, "latents": lat["latents"]}
    tx = make_style_optimizer(train_cfg)
    b = train_cfg.batch_size
    state = StyleTrainState(
        step=jnp.asarray(train_cfg.origin_step, jnp.int32),
        params=params,
        mu=lat["mu"],
        logvar=lat["logvar"],
        opt_state=tx.init(params),
        coh_x=jnp.zeros((b, 3)),
        coh_y=jnp.zeros((b, 3)),
        coh_x_origin=jnp.zeros((b, 3)),
        cnt=jnp.zeros((), jnp.int32),
        style_start=jnp.zeros((), jnp.int32),
        frame_start=jnp.zeros((), jnp.int32),
        block=jnp.zeros((), jnp.int32),
        start=jnp.zeros((), jnp.int32),
    )
    return concat_model, style_model, state


def make_style_train_step(
    nerf_coarse: NerfMLP,
    nerf_fine: NerfMLP,
    nerf_params_coarse: Any,
    nerf_params_fine: Any,
    concat_model: StyleMLPBeforeConcat,
    style_model: StyleMLPWildMultilayers,
    cfg: StyleTrainConfig,
    mesh=None,
    k_steps: int = 1,
    with_grad_ratio: bool = False,
):
    """Build the jitted Phase-E step:
    ``(state, data: StyleSceneData, key) -> (state, metrics)``.

    With ``mesh``, both gathered ray streams shard over the ``data`` axis
    (params replicated; XLA inserts the grad psum) — the multi-chip analog
    of the reference's single-process training.

    With ``k_steps > 1`` the returned function runs K steps per dispatch
    via ``lax.scan`` (metrics come back stacked ``[K]``). The per-step key
    schedule folds ``state.step`` INSIDE the step, so a K-scan with one
    key is bit-identical to K sequential calls with that key — the
    reference's per-iteration Python loop (256×2-ray batches,
    /root/reference/train_tgtcs.py:345-501) is dispatch-latency-bound on
    an accelerator (~20 steps/s measured round 2); amortizing the launch
    over K steps is what lifts it."""
    tx = make_style_optimizer(cfg)

    def shard(batch):
        if mesh is None:
            return batch
        from tgtc.parallel.mesh import data_sharding

        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, data_sharding(mesh, x.ndim)
            ),
            batch,
        )

    def two_pass(params, latent_state, batch, key, stop_grad_latents):
        """Coarse+fine stylized forward for one stream. Returns
        (rgb_coarse [B,3], rgb_fine [B,3])."""
        lat = latent_state
        if stop_grad_latents:
            lat = jax.tree.map(jax.lax.stop_gradient, lat)
        k_samp, k_n1, k_n2 = jax.random.split(key, 3)
        _, ts = sample_along_rays_uniform(
            batch["rays_o"], batch["rays_d"], cfg.n_samples,
            near=cfg.near, far=cfg.far, key=k_samp,
        )
        comp_c, weights, sigma_c = style_forward(
            nerf_coarse, nerf_params_coarse, concat_model, params["concat"],
            style_model, params["style"], lat,
            batch["rays_o"], batch["rays_d"], ts,
            batch["style_id"], batch["frame_id"],
            sigma_scale=cfg.sigma_scale,
            llff_tile=cfg.llff_tile and cfg.dataset_type == "llff",
            noise_std=cfg.sigma_noise_std, noise_key=k_n1,
            with_sigma=True,
        )
        _, ts_fine = merge_and_resample_fine(
            batch["rays_o"], batch["rays_d"], ts, weights, cfg.n_samples_fine
        )
        deltas_fine = None
        if cfg.fine_budget is not None:
            # training-time ERT on the stylized fine pass: the density is
            # FROZEN (style grads never touch it), so the selector's score
            # is exactly the converged-density estimate the render-time ERT
            # was validated on. grid=None: the coarse grid is perturbed.
            ts_fine, deltas_fine = select_sample_budget(
                ts_fine, ts, sigma_c, cfg.fine_budget
            )
        comp_f, _ = style_forward(
            nerf_fine, nerf_params_fine, concat_model, params["concat"],
            style_model, params["style"], lat,
            batch["rays_o"], batch["rays_d"], ts_fine,
            batch["style_id"], batch["frame_id"],
            sigma_scale=cfg.sigma_scale,
            llff_tile=cfg.llff_tile and cfg.dataset_type == "llff",
            noise_std=cfg.sigma_noise_std, noise_key=k_n2,
            deltas=deltas_fine,
        )
        return comp_c.rgb, comp_f.rgb

    def step_fn(state: StyleTrainState, data: StyleSceneData, key: jax.Array):
        # coh pixels must be STABLE across the frames of one cycle — derive
        # them from the UNfolded key (gather_coh_batch keys them only on
        # style_start/block); everything else folds in the step.
        k_coh_pix = jax.random.fold_in(key, 7)
        key = jax.random.fold_in(key, state.step)
        k_main, k_fwd1, k_fwd2 = jax.random.split(key, 3)

        main = shard(gather_main_batch(data, k_main, cfg.batch_size))
        coh = shard(gather_coh_batch(
            data, k_coh_pix, state.style_start, state.frame_start,
            state.block, cfg.batch_size,
        ))

        frame_num = data.frame_num

        def loss_fn(params):
            latent_state = {
                "latents": params["latents"],
                "mu": state.mu,
                "logvar": state.logvar,
            }
            # main stream (grads → style MLPs and latents)
            rgb_c, rgb_f = two_pass(params, latent_state, main, k_fwd1, False)
            loss_rgb = cfg.rgb_loss_lambda * (
                img2mse(rgb_c, main["rgb_gt"]) + img2mse(rgb_f, main["rgb_gt"])
            )
            logp_lambda = cfg.logp_loss_lambda * (
                cfg.logp_loss_decay
                ** ((state.step - cfg.origin_step) // 1000)
            )
            loss_logp = logp_lambda * latent_minus_logp(
                latent_state, main["style_id"], main["frame_id"],
                cfg.sigma_scale, cfg.llff_tile and cfg.dataset_type == "llff",
            )

            # coherent stream (latents stopped → coh grads reach only MLPs,
            # matching the reference's separate latent backward)
            rgb_c2, rgb_f2 = two_pass(params, latent_state, coh, k_fwd2, True)

            at_reset = state.cnt == frame_num
            active = (state.cnt != 0) & (~at_reset)
            coh_c = l2_norm(
                cosine_similarity(rgb_c2, state.coh_x)
                - cosine_similarity(coh["rgb_origin"], state.coh_x_origin)
            )
            coh_f = l2_norm(
                cosine_similarity(rgb_f2, state.coh_y)
                - cosine_similarity(coh["rgb_origin"], state.coh_x_origin)
            )
            loss_coh = jnp.where(active, coh_c + coh_f, 0.0)
            coh_on = (state.step <= cfg.coh_until_step).astype(jnp.float32)
            total = loss_rgb + loss_logp + coh_on * cfg.loss_coh_lambda * loss_coh
            aux = {
                "loss_rgb": loss_rgb,
                "loss_logp": loss_logp,
                "loss_coh": loss_coh,
                "rgb_c2": rgb_c2,
                "rgb_f2": rgb_f2,
            }
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # coherence buffer / counter updates (reference cnt logic,
        # /root/reference/train_tgtcs.py:396-403,455-468)
        at_reset = state.cnt == frame_num
        new_cnt = jnp.where(at_reset, 1, state.cnt + 1)
        s2, f2, b2, st2 = advance_coh_counters(
            state.style_start, state.frame_start, state.block, state.start,
            data.style_num, frame_num, cfg.batch_size,
            data.hw[0] * data.hw[1],
        )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            coh_x=jax.lax.stop_gradient(aux["rgb_c2"]),
            coh_y=jax.lax.stop_gradient(aux["rgb_f2"]),
            coh_x_origin=coh["rgb_origin"],
            cnt=new_cnt,
            style_start=s2, frame_start=f2, block=b2, start=st2,
        )
        metrics = {
            "loss": total,
            "loss_rgb": aux["loss_rgb"],
            "loss_logp": aux["loss_logp"],
            "loss_coh": aux["loss_coh"],
        }
        if with_grad_ratio:
            # per-term gradient norms for the coherence-regime diagnostic
            # (coherence_grad_ratio below): two extra backward passes,
            # only ever built for the one-off scratch dispatch at Phase-E
            # start — never in the production step
            g_rgb = jax.grad(lambda p: loss_fn(p)[1]["loss_rgb"])(
                state.params)
            g_coh = jax.grad(lambda p: loss_fn(p)[1]["loss_coh"])(
                state.params)
            coh_scale = (
                (state.step <= cfg.coh_until_step).astype(jnp.float32)
                * cfg.loss_coh_lambda
            )
            metrics["grad_norm_rgb"] = optax.global_norm(g_rgb)
            metrics["grad_norm_coh"] = (
                coh_scale * optax.global_norm(g_coh))
        return new_state, metrics

    if k_steps == 1:
        # diagnostic mode must NOT donate: the caller reuses the probed
        # state for the real training run (coherence_grad_ratio)
        donate = () if with_grad_ratio else (0,)
        return jax.jit(step_fn, donate_argnums=donate)

    def scan_fn(state: StyleTrainState, data: StyleSceneData, key: jax.Array):
        def body(st, _):
            return step_fn(st, data, key)

        return jax.lax.scan(body, state, None, length=k_steps)

    return jax.jit(scan_fn, donate_argnums=(0,))


# ||grad(λ·coh)|| / ||grad(rgb)|| above this is the saturation regime:
# the coherence term owns the update and Phase-E rgb quality dies
# (BASELINE.md round-3 bisect: 450x dominance at λ=1.0 on the spec scene
# → 7.5 dB renders; λ=0.02 → 35.2 dB)
COH_RATIO_WARN = 10.0


def coherence_grad_ratio(
    diag_step_fn, state: StyleTrainState, data: StyleSceneData,
    key: jax.Array,
) -> Tuple[float, float, float]:
    """Measure the rgb-vs-coherence gradient-norm ratio at Phase-E start.

    Runs TWO scratch steps with a ``with_grad_ratio=True`` step function
    (the coherence stream needs one step of buffer history before it is
    active) and reads the norms from the second; the probed states are
    discarded, so the production trajectory is bit-identical to a run
    without the diagnostic. The reference's fixed λ_coh schedule
    (/root/reference/train_tgtcs.py:482-483) has no such check — a config
    replayed on a high-chroma scene silently trains a dead run.

    Returns ``(ratio, grad_norm_coh, grad_norm_rgb)``.
    """
    st, _ = diag_step_fn(state, data, key)
    _, m = diag_step_fn(st, data, key)
    g_rgb = float(m["grad_norm_rgb"])
    g_coh = float(m["grad_norm_coh"])
    return g_coh / max(g_rgb, 1e-12), g_coh, g_rgb
