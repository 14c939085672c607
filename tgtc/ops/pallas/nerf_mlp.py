"""Fused NeRF-MLP Pallas kernel (feature-major layout, packed weights).

Why: the XLA path for the trunk (tgtc.models.nerf) is HBM-bound — every
256-wide layer round-trips a [points, 256] activation tensor through HBM
(measured ~60 TFLOP/s on v5e, ~15% MXU). This kernel keeps ALL weights and
per-tile activations resident in VMEM, so HBM traffic collapses to reading
pts/dirs and writing rgb+sigma.

Design notes (measured on v5e):

* **Feature-major ``[features, points]`` layout.** TPU VMEM tiles are
  (sublane, 128-lane); a point-major ``[T, 3]`` block pads its last dim
  3 → 128 (42x memory waste), while ``[3, T]`` pads only sublanes 3 → 8.
  The wide point axis rides the lanes.
* **Two packed weight buffers** instead of ~25 separate operands: per-grid-
  step DMA issue latency for many small blocks dominated the first version
  (~35 us/step overhead). ``W1 [256, *]`` holds the trunk layers column-
  blocked; ``W2 [128, *]`` holds the sigma/rgb heads. Static column slices
  inside the kernel are free.
* **Positional encoding as matmul+sin**: ``E = sin(Pmat @ pts + phase)``
  where ``Pmat`` places ``2**k`` per (feature, dim) slot and ``phase``
  selects sin/cos (``cos(x) = sin(x + pi/2)``). Pmat/phase are baked into
  the kernel as constants. Feature order matches the reference Embedder
  (/root/reference/models.py:49-57).
* bf16 matmuls with f32 accumulation; params packed to bf16.

Weight layout matches tgtc.models.nerf.NerfMLP (mirroring
/root/reference/models.py:75-93); ``pack_nerf_params`` converts trained
params. Inference-only (bulk render / geometry dump / stylized render);
training uses the XLA path where batches are small.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRUNK_W = 256
HEAD_W = 128


def _encoding_matrices(num_freqs: int) -> Tuple[np.ndarray, np.ndarray]:
    """(Pmat [6*L, 3], phase [6*L, 1]) such that sin(Pmat @ x + phase)
    reproduces the reference embedding's sin/cos block in feature order
    [sin(x*2^k) (3), cos(x*2^k) (3), ...] down the feature axis."""
    f = 6 * num_freqs
    pmat = np.zeros((f, 3), np.float32)
    phase = np.zeros((f, 1), np.float32)
    for k in range(num_freqs):
        for c in range(2):  # 0 = sin, 1 = cos
            for d in range(3):
                j = k * 6 + c * 3 + d
                pmat[j, d] = 2.0 ** k
                phase[j, 0] = 0.0 if c == 0 else np.pi / 2.0
    return pmat, phase


def pack_nerf_params(
    params: Any,
    depth: int = 8,
    num_freq_coor: int = 10,
    num_freq_dir: int = 4,
    skip: int = 4,
    width: int = 256,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack flax NerfMLP params into (W1 [256, c1], W2 [128, c2]) bf16.

    W1 column blocks: [w0 | b0 | (per layer i: {wx|we} if skip-input | wh | b)
    ... | wrm | brm]; W2 column blocks: [wsig(row 0) | bsig | wr0 | br0 |
    wr1(rows 0:3) | br1]. Dense kernels are transposed to [out, in]; the
    skip layer's input order (x first) follows /root/reference/models.py:100,
    the rgb head's (base_remap, dirs) /root/reference/models.py:108.
    """
    p = params["params"]
    ec, ed = 6 * num_freq_coor, 6 * num_freq_dir
    in_c, in_d = 3 + ec, 3 + ed

    def kern(name):  # [out, in]
        return np.asarray(p[name]["kernel"], np.float32).T

    def bias(name):  # [out, 1]
        return np.asarray(p[name]["bias"], np.float32)[:, None]

    t_rows = max(width, TRUNK_W)  # base_remap output is always 256 wide

    def pad_t(a):
        out = np.zeros((t_rows, a.shape[1]), np.float32)
        out[: a.shape[0]] = a
        return out

    w1_blocks: List[np.ndarray] = [pad_t(kern("base_0")), pad_t(bias("base_0"))]
    for i in range(1, depth):
        wi = kern(f"base_{i}")
        if i == skip + 1:
            # input was concat([x_embed, h]): cols [0:in_c] = x part
            w1_blocks += [pad_t(wi[:, :in_c]), pad_t(wi[:, in_c:]),
                          pad_t(bias(f"base_{i}"))]
        else:
            w1_blocks += [pad_t(wi), pad_t(bias(f"base_{i}"))]
    w1_blocks += [pad_t(kern("base_remap")), pad_t(bias("base_remap"))]
    w1 = np.concatenate(w1_blocks, axis=1)

    h_rows = max(width // 2, HEAD_W)

    def pad_rows(a, rows=None):
        rows = h_rows if rows is None else rows
        out = np.zeros((rows, a.shape[1]), np.float32)
        out[: a.shape[0]] = a
        return out

    pmat_c, phase_c = _encoding_matrices(num_freq_coor)
    pmat_d, phase_d = _encoding_matrices(num_freq_dir)
    w2_blocks = [
        pad_rows(kern("sigma")),          # [1, width] in rows 0:1
        pad_rows(bias("sigma")),
        pad_rows(kern("rgb_0")),           # [width//2, 256 + in_d]
        pad_rows(bias("rgb_0")),
        pad_rows(kern("rgb_1")),           # [3, width//2] in rows 0:3
        pad_rows(bias("rgb_1")),
    ]
    w2 = np.concatenate(w2_blocks, axis=1)
    # encoding constants in their own f32 operand (pallas kernels cannot
    # capture array constants, and pi/2 phases are not bf16-exact)
    e_rows = max(ec, ed, 8)
    enc_blocks = [pad_rows(pmat_c, e_rows), pad_rows(phase_c, e_rows),
                  pad_rows(pmat_d, e_rows), pad_rows(phase_d, e_rows)]
    enc = np.concatenate(enc_blocks, axis=1)  # [e_rows, 8] f32
    return jnp.asarray(w1, dtype), jnp.asarray(w2, dtype), jnp.asarray(enc, jnp.float32)


def _make_kernel(depth: int, skip: int, num_freq_coor: int, num_freq_dir: int,
                 width: int, n_chunks: int = 2):
    """``n_chunks > 1`` processes the tile as independent sub-tiles —
    parallel dependency chains let Mosaic overlap one chunk's VPU
    epilogues (sin/relu/cast/sigmoid) with another's MXU matmuls.
    Measured (perf/kernel_lab.py, v5e): ~90-97 Mpts/s single-chain vs a
    consistent ~100 Mpts/s with 2 chunks at tile 4096; the math is
    identical per point."""
    ec, ed = 6 * num_freq_coor, 6 * num_freq_dir
    in_c, in_d = 3 + ec, 3 + ed
    tw = width
    hw = width // 2

    def kernel(pts_ref, dirs_ref, w1_ref, w2_ref, enc_ref, rgb_ref, sigma_ref):
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        enc = enc_ref[:]
        pmat_c, phase_c = enc[:ec, 0:3], enc[:ec, 3:4]
        pmat_d, phase_d = enc[:ed, 4:7], enc[:ed, 7:8]
        w1_full, w2_full = w1_ref[:], w2_ref[:]

        tile = pts_ref.shape[1]
        chunks = n_chunks if tile % n_chunks == 0 else 1

        for c in range(chunks):
            sl = slice(c * (tile // chunks), (c + 1) * (tile // chunks))
            pts = pts_ref[:, sl].astype(f32)  # [3, T]
            e_c = jnp.concatenate(
                [pts, jnp.sin(mm(pmat_c, pts) + phase_c)],
                axis=0,
            ).astype(bf16)  # [in_c, T]
            # dirs encoding hoisted ahead of the trunk: it has no
            # dependency on the layer chain, so the scheduler can overlap
            # its sin block with the first matmuls (measured ~+5 Mpts/s
            # vs encoding it between sigma and the rgb head)
            dirs = dirs_ref[:, sl].astype(f32)
            e_d = jnp.concatenate(
                [dirs, jnp.sin(mm(pmat_d, dirs) + phase_d)],
                axis=0,
            ).astype(bf16)  # [in_d, T]

            w1 = w1_full
            off = 0

            def take(cols, rows=tw):
                nonlocal off
                blk = w1[:rows, off : off + cols]
                off += cols
                return blk

            w0, b0 = take(in_c), take(1)
            h = jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
            for i in range(1, depth):
                if i == skip + 1:
                    wx, wh, b = take(in_c), take(tw), take(1)
                    h = mm(wh, h) + mm(wx, e_c) + b.astype(f32)
                else:
                    wh, b = take(tw), take(1)
                    h = mm(wh, h) + b.astype(f32)
                h = jnp.maximum(h, 0.0).astype(bf16)

            wrm, brm = take(tw, rows=TRUNK_W), take(1, rows=TRUNK_W)
            br = jnp.maximum(mm(wrm, h) + brm.astype(f32), 0.0).astype(bf16)

            w2 = w2_full
            off = 0

            def take2(cols):
                nonlocal off
                blk = w2[:, off : off + cols]
                off += cols
                return blk

            wsig, bsig = take2(tw), take2(1)
            sigma = (mm(wsig[:1], h) + bsig[:1].astype(f32))  # [1, T]

            wr0, br0 = take2(TRUNK_W + in_d), take2(1)
            rf = jnp.maximum(
                mm(wr0[:hw, :TRUNK_W], br) + mm(wr0[:hw, TRUNK_W:], e_d)
                + br0[:hw].astype(f32),
                0.0,
            ).astype(bf16)  # [width//2, T]

            wr1, br1 = take2(hw), take2(1)
            rgb = jax.nn.sigmoid(mm(wr1[:3], rf) + br1[:3].astype(f32))

            rgb_ref[:, sl] = rgb.astype(rgb_ref.dtype)
            sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)

    return kernel


def _make_sigma_kernel(depth: int, skip: int, num_freq_coor: int,
                       width: int, n_chunks: int = 2):
    """Trunk→sigma only (no dirs encoding, base_remap, or rgb branch) —
    for the coarse render pass, whose output feeds nothing but
    sample_pdf's importance weights (the coarse rgb is discarded at
    render time; the reference computes it anyway,
    /root/reference/rendering.py:118-136). Reads the same packed W1/W2
    buffers as the full kernel."""
    ec = 6 * num_freq_coor
    in_c = 3 + ec
    tw = width

    def kernel(pts_ref, w1_ref, w2_ref, enc_ref, sigma_ref):
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        enc = enc_ref[:]
        pmat_c, phase_c = enc[:ec, 0:3], enc[:ec, 3:4]
        w1, w2 = w1_ref[:], w2_ref[:]

        tile = pts_ref.shape[1]
        chunks = n_chunks if tile % n_chunks == 0 else 1

        for c in range(chunks):
            sl = slice(c * (tile // chunks), (c + 1) * (tile // chunks))
            pts = pts_ref[:, sl].astype(f32)
            e_c = jnp.concatenate(
                [pts, jnp.sin(mm(pmat_c, pts) + phase_c)], axis=0
            ).astype(bf16)

            off = 0

            def take(cols):
                nonlocal off
                blk = w1[:tw, off : off + cols]
                off += cols
                return blk

            w0, b0 = take(in_c), take(1)
            h = jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
            for i in range(1, depth):
                if i == skip + 1:
                    wx, wh, b = take(in_c), take(tw), take(1)
                    h = mm(wh, h) + mm(wx, e_c) + b.astype(f32)
                else:
                    wh, b = take(tw), take(1)
                    h = mm(wh, h) + b.astype(f32)
                h = jnp.maximum(h, 0.0).astype(bf16)

            wsig, bsig = w2[:, :tw], w2[:, tw : tw + 1]
            sigma = mm(wsig[:1], h) + bsig[:1].astype(f32)
            sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skip", "num_freq_coor", "width", "tile",
                     "interpret"),
)
def fused_nerf_sigma_apply_t(
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    enc: jnp.ndarray,
    pts_t: jnp.ndarray,
    depth: int = 8,
    skip: int = 4,
    num_freq_coor: int = 10,
    width: int = 256,
    tile: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """``pts_t [3, P]`` → sigma [1, P] from the same packed buffers as
    :func:`fused_nerf_apply_t` (trunk + sigma head only)."""
    p = pts_t.shape[1]
    assert p % tile == 0, (p, tile)
    point_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_sigma_kernel(depth, skip, num_freq_coor, width),
        grid=(p // tile,),
        in_specs=[point_spec, full(w1), full(w2), full(enc)],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.float32),
        interpret=interpret,
    )(pts_t, w1, w2, enc)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skip", "num_freq_coor", "num_freq_dir",
                     "width", "tile", "interpret"),
)
def fused_nerf_apply_t(
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    enc: jnp.ndarray,
    pts_t: jnp.ndarray,
    dirs_t: jnp.ndarray,
    depth: int = 8,
    skip: int = 4,
    num_freq_coor: int = 10,
    num_freq_dir: int = 4,
    width: int = 256,
    tile: int = 4096,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-major entry: ``pts_t/dirs_t [3, P]`` → (rgb [3,P], sigma [1,P]).
    P must be a multiple of ``tile``."""
    p = pts_t.shape[1]
    assert p % tile == 0, (p, tile)
    grid = (p // tile,)

    point_spec = pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    flops_per_pt = 2 * (
        63 * 256 + 6 * 256 * 256 + 63 * 256 + 256 * 256 + 256
        + (256 + 27) * 128 + 128 * 3
    )
    rgb, sigma = pl.pallas_call(
        _make_kernel(depth, skip, num_freq_coor, num_freq_dir, width),
        grid=grid,
        in_specs=[point_spec, point_spec, full(w1), full(w2), full(enc)],
        out_specs=(
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * p,
            bytes_accessed=(3 + 3 + 3 + 1) * p * 4,
            transcendentals=(60 + 24 + 3) * p,
        ),
        interpret=interpret,
    )(pts_t, dirs_t, w1, w2, enc)
    return rgb, sigma


def fused_nerf_apply(
    packed: Tuple[jnp.ndarray, jnp.ndarray],
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    tile: int = 4096,
    interpret: bool = False,
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Point-major convenience wrapper: ``pts/dirs [P, 3]`` → dict with
    ``rgb [P, 3]`` and ``sigma [P]``. Pads P to a tile multiple."""
    w1, w2, enc = packed
    p = pts.shape[0]
    p_pad = ((p + tile - 1) // tile) * tile
    pts_t = jnp.zeros((3, p_pad), pts.dtype).at[:, :p].set(pts.T)
    dirs_t = jnp.ones((3, p_pad), dirs.dtype).at[:, :p].set(dirs.T)
    rgb, sigma = fused_nerf_apply_t(
        w1, w2, enc, pts_t, dirs_t, tile=tile, interpret=interpret, **kw
    )
    return {"rgb": rgb[:, :p].T, "sigma": sigma[0, :p]}
