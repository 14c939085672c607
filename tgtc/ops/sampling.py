"""Ray-sample generation: stratified uniform + hierarchical inverse-CDF.

Rewrites the reference samplers (/root/reference/utils.py:509-609) as pure,
key-threaded jnp functions with static shapes:

* :func:`sample_along_rays_uniform` — ``sampling_pts_uniform`` parity
  (uniform / disparity ["harmony"] spacing, optional mid-bin jitter).
* :func:`sample_pdf` — ``sample_pdf`` parity (inverse-CDF importance
  sampling). torch.searchsorted becomes a branchless comparison-count
  plus one-hot einsum gathers — NOT ``jnp.searchsorted``, whose vmapped
  binary search lowers to a serial while-loop on TPU and measured ~88 ms
  per 16k-ray block (see BASELINE.md round-2 bisect).
* :func:`merge_and_resample_fine` — ``sampling_pts_fine_torch`` parity
  (resample from coarse weights, merge + sort coarse∪fine depths).

All functions treat the sample axis as statically shaped so the fused
render path compiles once per (rays, samples) geometry.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tgtc.ops.composite import sigma_weights


def sample_along_rays_uniform(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    n_samples: int,
    near: float = 0.0,
    far: float = 1.05,
    harmony: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified depths along each ray.

    Args:
        rays_o, rays_d: ``[R, 3]`` origins / directions.
        n_samples: static sample count N.
        harmony: disparity-space spacing (reference ``harmony=True`` branch,
            /root/reference/utils.py:514-516).
        key: if given, jitter each depth uniformly within its bin
            (reference ``perturb=True``, /root/reference/utils.py:518-524).

    Returns:
        ``pts [R, N, 3]``, ``ts [R, N]``.
    """
    r = rays_o.shape[0]
    ts = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    if not harmony:
        ts = ts * (far - near) + near
    else:
        ts = 1.0 / (1.0 / near * (1.0 - ts) + 1.0 / far * ts)
    ts = jnp.broadcast_to(ts, (r, n_samples))

    if key is not None:
        mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
        upper = jnp.concatenate([mid, ts[..., -1:]], axis=-1)
        lower = jnp.concatenate([ts[..., :1], mid], axis=-1)
        u = jax.random.uniform(key, (r, n_samples), dtype=ts.dtype)
        ts = lower + (upper - lower) * u

    pts = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    return pts, ts


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` new depths from per-bin weights.

    Parity with /root/reference/utils.py:583-608: ``bins [R, B]`` are bin
    *centers* (B values bounding B-1 intervals), ``weights [R, B-1]``.
    Deterministic (evenly spaced u) when ``key is None`` — note the
    reference's Phase-A hot loop always uses ``det=True``
    (/root/reference/utils.py:575).
    """
    if bins.shape[-1] != weights.shape[-1] + 1:
        raise ValueError(
            f"bins [R, B] needs weights [R, B-1]; got {bins.shape} / "
            f"{weights.shape}"
        )
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B]

    r = bins.shape[0]
    if key is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (r, n_samples))
    else:
        u = jax.random.uniform(key, (r, n_samples), dtype=bins.dtype)

    # searchsorted 'right' per ray, TPU-first: a vmapped binary search
    # lowers to a serial while-loop with dynamic gathers (measured ~88 ms
    # for [16k, 64] on v5e — the whole render's dominant cost). The CDF is
    # sorted and short (B ≈ 64), so count comparisons instead (branchless,
    # one fused VPU reduce) and replace the row-gathers with one-hot
    # matmuls that ride the MXU. Numerically identical: the comparison
    # count IS the right-insertion index for a sorted array.
    b = cdf.shape[-1]
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )  # [R, N]
    below = jnp.clip(inds - 1, 0, b - 1)
    above = jnp.clip(inds, 0, b - 1)

    iota = jnp.arange(b, dtype=jnp.int32)
    oh_below = (below[..., None] == iota).astype(bins.dtype)  # [R, N, B]
    oh_above = (above[..., None] == iota).astype(bins.dtype)
    table = jnp.stack([cdf, bins], axis=-1)                   # [R, B, 2]
    gb = jnp.einsum("rnb,rbk->rnk", oh_below, table)
    ga = jnp.einsum("rnb,rbk->rnk", oh_above, table)
    cdf_below, bins_below = gb[..., 0], gb[..., 1]
    cdf_above, bins_above = ga[..., 0], ga[..., 1]

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_two_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row-sorted arrays ``a [R, Na]`` and ``b [R, Nb]`` into a
    sorted ``[R, Na+Nb]`` WITHOUT a general sort.

    Rank-based: each element's output slot is its own index plus the count
    of smaller elements in the other array (ties resolved a-first). TPU
    formulation: two branchless comparison reductions, then ONE-HOT EINSUM
    placement instead of a scatter — row-scatters lower to slow dynamic
    updates on TPU while the one-hot matmuls ride the MXU (same trick as
    sample_pdf's gathers). Replaces the bitonic ``jnp.sort`` in
    hierarchical resampling: coarse depths are sorted and deterministic
    sample_pdf output is monotone (increasing quantiles).
    """
    na, nb = a.shape[-1], b.shape[-1]
    n = na + nb
    pos_a = jnp.arange(na) + jnp.sum(
        b[..., None, :] < a[..., :, None], axis=-1
    )
    pos_b = jnp.arange(nb) + jnp.sum(
        a[..., None, :] <= b[..., :, None], axis=-1
    )
    iota = jnp.arange(n)
    oh_a = (pos_a[..., None] == iota).astype(a.dtype)   # [R, na, n]
    oh_b = (pos_b[..., None] == iota).astype(a.dtype)   # [R, nb, n]
    return (
        jnp.einsum("ran,ra->rn", oh_a, a)
        + jnp.einsum("rbn,rb->rn", oh_b, b)
    )


def select_sample_budget(
    ts_all: jnp.ndarray,
    ts_coarse: jnp.ndarray,
    sigma_coarse: jnp.ndarray,
    budget: int,
    grid: Optional[Tuple[float, float]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Early ray termination / empty-space skip as a static-shape top-K.

    The reference composites every merged sample unconditionally
    (/root/reference/utils.py:354-386); per-ray early-exit loops don't map to
    the TPU's SIMD model, but *sample culling* does: estimate each merged
    sample's compositing weight from the COARSE density field — gather the
    piecewise-constant coarse sigma at each merged depth and run the
    quadrature (:func:`tgtc.ops.composite.sigma_weights`) at merged
    resolution — then keep the top ``budget`` per ray in depth order and
    hand the fine MLP a dense ``[R, budget]`` problem. Everything is
    branchless comparison-counts, one ``top_k``, and one-hot MXU gathers
    (same playbook as :func:`sample_pdf`).

    The estimator is near-oracle: measured dropped true-weight mass within
    ~10% of a true-fine-weight top-K on a trained scene (the only error
    source is coarse-vs-fine field mismatch); naive per-bin-weight scoring
    over-drops lone carriers outside the surface bin by ~2x
    (tests/test_fine_budget.py).

    Returns ``(ts_kept [R, budget], deltas_kept [R, budget])`` where the
    deltas are each kept sample's interval length *in the full set* — so
    compositing the subset (``alpha_composite(..., deltas=deltas_kept)``)
    equals the full composite with the dropped samples' alphas forced to
    zero. The approximation error is exactly the dropped weight mass,
    which the score ordering minimises.

    ``grid``: optional ``(near, far)``. Pass it ONLY when ``ts_coarse`` is
    the unperturbed uniform linspace over that range (the plain-NeRF fused
    render path) — the coarse-bin lookup then becomes a direct floor
    instead of the comparison-count. Perturbed or disparity-spaced grids
    (the style render path) must leave it ``None``.
    """
    r, m = ts_all.shape
    nc = ts_coarse.shape[-1]
    if not 0 < budget <= m:
        raise ValueError(f"budget {budget} must be in (0, {m}]")

    if grid is not None:
        # caller guarantees ts_coarse is the UNPERTURBED linspace over
        # [near, far]: the coarse interval is a direct floor, skipping the
        # [R, M, NC] comparison-count. The +1e-4 (in bin units, far above
        # fp error, far below any real in-bin offset) keeps samples that
        # sit exactly on a grid point in their own bin. Bitwise-equal to
        # the comparison-count on the fused render shapes — measured
        # 3.46 vs 3.84 ms/16k-ray block (perf/ert_select_lab.py).
        near, far = grid
        step = (far - near) / (nc - 1)
        idx_bin = jnp.floor((ts_all - near) / step + 1e-4).astype(jnp.int32)
    else:
        # coarse interval of each merged sample: count(ts_coarse <= t) - 1
        idx_bin = jnp.sum(
            (ts_coarse[:, None, :] <= ts_all[:, :, None]).astype(jnp.int32),
            axis=-1,
        ) - 1
    idx_bin = jnp.clip(idx_bin, 0, nc - 1)
    oh_bin = (idx_bin[..., None] == jnp.arange(nc)).astype(ts_all.dtype)
    sigma_est = jnp.einsum("rmb,rb->rm", oh_bin, sigma_coarse)  # [R, M]
    score = sigma_weights(sigma_est, ts_all)                    # [R, M]
    # The selector is a pure heuristic: at TRAINING time (round-5
    # --train_fine_budget) gradients must flow only through the kept
    # samples' MLP evaluations, never through the scoring itself. top_k
    # indices are non-differentiable anyway; the stop_gradient makes the
    # invariant explicit and free.
    score = jax.lax.stop_gradient(score)

    _, keep = jax.lax.top_k(score, budget)
    keep = jnp.sort(keep, axis=-1)  # restore depth order

    deltas = ts_all[..., 1:] - ts_all[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1
    )
    oh_keep = (keep[..., None] == jnp.arange(m)).astype(ts_all.dtype)
    table = jnp.stack([ts_all, deltas], axis=-1)              # [R, M, 2]
    g = jnp.einsum("rkm,rmj->rkj", oh_keep, table)
    return g[..., 0], g[..., 1]


def merge_and_resample_fine(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    ts: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples_fine: int,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hierarchical resampling: draw fine depths from the coarse weight PDF,
    merge with the coarse depths, and sort.

    Parity with ``sampling_pts_fine_torch`` (/root/reference/utils.py:573-580):
    bins are coarse-depth midpoints, weights drop the first/last sample, the
    result is detached (`stop_gradient`) so sampling is not differentiated.
    """
    ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
    t_new = sample_pdf(ts_mid, weights[..., 1:-1], n_samples_fine, key=key)
    t_new = jax.lax.stop_gradient(t_new)
    # rank-merge (merge_two_sorted) wins standalone but loses inside the
    # fused render (bench 515k vs 534k rays/s): XLA fuses the sort with its
    # consumers while the one-hot einsum intermediates spill — keep sort
    t_all = jnp.sort(jnp.concatenate([ts, t_new], axis=-1), axis=-1)
    t_all = jax.lax.stop_gradient(t_all)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t_all[..., None]
    return pts, t_all
