"""Fused stylized-point-evaluation Pallas kernel.

One kernel evaluates the ENTIRE Phase-F per-point chain
(/root/reference/rendering.py:118-182):

    frozen NeRF trunk (base layers → sigma, base_remap)
    → concat-style MLP (pts_embed, full latent)
    → style MLP (pts_embed, [base_remap ‖ concat_features], scalar latent)

with ALL three networks' weights (~2.7 MB bf16) resident in VMEM — the XLA
path writes [P, 256] base_remap / concat-feature tensors to HBM between
networks. ~1.9 MFLOP/point of chained matmuls stay on the MXU.

Layout/tricks follow tgtc.ops.pallas.nerf_mlp (feature-major ``[F, T]``,
encoding as matmul+sin, packed weight buffers, biases as columns). Two
structural specializations:

* The style MLP's latent input is the reference's scalar-mean broadcast
  (/root/reference/train_tgtcs.py:379) — so each latent matmul collapses to
  a rank-1 term ``(W_l @ 1) * mean(lat)``, precomputed as a column at pack
  time.
* No view directions: the style chain never uses the rgb head
  (viewdir only feeds the trunk's rgb head, which Phase E/F discard).

Weight layouts match tgtc.models.{nerf,style_field}; ``pack_style_params``
converts trained params.
"""

from __future__ import annotations

import functools
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgtc.ops.pallas.nerf_mlp import _encoding_matrices

TRUNK_W = 256


def pack_style_params(
    nerf_params: Any,
    concat_params: Any,
    style_params: Any,
    depth: int = 8,
    num_freq_coor: int = 10,
    skip: int = 4,
    style_d: int = 8,
    style_width: int = 256,
    latent_dim: int = 32,
    trunk_width: int = 256,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (W_trunk [256, *], W_style [max(width,256), *], Wsig [8pad, 256+1],
    enc [64pad, 4]).

    Column blocking (f32 → dtype at the end):
      W_trunk: trunk base layers as in nerf_mlp.pack_nerf_params
               (w0|b0|...|{wx|wh|b at skip}|...) + base_remap + brm.
      W_style: concat MLP layers (per layer: [we? wh? wl | b]) then style MLP
               layers (wbr/wcf/wx/wh splits | wl_sum col | b) then the rgb
               out row-block.
    """
    ec = 6 * num_freq_coor
    in_c = 3 + ec

    np_ = lambda x: np.asarray(x, np.float32)

    def kern(p, name):  # [out, in]
        return np_(p["params"][name]["kernel"]).T

    def bias(p, name):  # [out, 1]
        return np_(p["params"][name]["bias"])[:, None]

    tw = trunk_width
    t_rows = max(tw, TRUNK_W)  # base_remap output is always 256 wide

    def pad_t(a):
        out = np.zeros((t_rows, a.shape[1]), np.float32)
        out[: a.shape[0]] = a
        return out

    # ---- trunk (base layers + base_remap only; no sigma/rgb here)
    blocks: List[np.ndarray] = [pad_t(kern(nerf_params, "base_0")),
                                pad_t(bias(nerf_params, "base_0"))]
    for i in range(1, depth):
        wi = kern(nerf_params, f"base_{i}")
        if i == skip + 1:
            blocks += [pad_t(wi[:, :in_c]), pad_t(wi[:, in_c:]),
                       pad_t(bias(nerf_params, f"base_{i}"))]
        else:
            blocks += [pad_t(wi), pad_t(bias(nerf_params, f"base_{i}"))]
    blocks += [pad_t(kern(nerf_params, "base_remap")),
               pad_t(bias(nerf_params, "base_remap"))]
    w_trunk = np.concatenate(blocks, axis=1)

    # ---- sigma head (1 row, padded to 8 sublanes)
    wsig = np.zeros((8, tw + 1), np.float32)
    wsig[:1, :tw] = kern(nerf_params, "sigma")
    wsig[:1, tw:] = bias(nerf_params, "sigma")

    # ---- style networks
    width = style_width
    rows = max(width, TRUNK_W)

    def pad_rows(a):
        out = np.zeros((rows, a.shape[1]), np.float32)
        out[: a.shape[0]] = a
        return out

    sblocks: List[np.ndarray] = []
    # concat MLP: n_layers = min(style_d - 1, skip + 1); inputs per layer i:
    #   i=0: [x_embed(in_c), lat(L)] ; 1..skip-1: [h(width), lat]
    #   i=skip: [h, lat, x_embed]
    # Layers 0 and skip consume BOTH x_embed and lat: their weights pack
    # as one [we | 0-pad | wl] block matched to the kernel's fused
    # ``el = [e_c ; 0 ; lat]`` operand — e_c (in_c rows) and lat (L rows)
    # each under 128 rows would otherwise each burn a full MXU K-tile;
    # fused they share one (in_c+pad+L ≤ 128 for the reference shapes).
    n_concat = min(style_d - 1, skip + 1)
    ecp = ((in_c + 7) // 8) * 8  # e_c rows padded to sublane multiple
    zpad = np.zeros((width, ecp - in_c), np.float32)
    for i in range(n_concat):
        w = kern(concat_params, f"layer_{i}")
        if i == 0:
            w_el = np.concatenate([w[:, :in_c], zpad, w[:, in_c:]], axis=1)
            sblocks += [pad_rows(w_el)]
        elif i == skip:
            w_el = np.concatenate([w[:, width + latent_dim :], zpad,
                                   w[:, width : width + latent_dim]], axis=1)
            sblocks += [pad_rows(w[:, :width]), pad_rows(w_el)]
        else:
            sblocks += [pad_rows(w[:, :width]), pad_rows(w[:, width:])]
        sblocks.append(pad_rows(bias(concat_params, f"layer_{i}")))

    # style MLP: layer inputs (latent = scalar-mean broadcast → rank-1 col):
    #   i=0: [base_remap(256), cf(width), x(in_c), lat(L)]
    #   i in 1..: [h(width), lat]; i=skip: + x
    for i in range(style_d - 1):
        w = kern(style_params, f"layer_{i}")
        if i == 0:
            sblocks += [
                pad_rows(w[:, :TRUNK_W]),                       # base_remap
                pad_rows(w[:, TRUNK_W : TRUNK_W + width]),      # cf
                pad_rows(w[:, TRUNK_W + width : TRUNK_W + width + in_c]),  # x
                pad_rows(w[:, TRUNK_W + width + in_c :].sum(1, keepdims=True)),
            ]
        elif i == skip:
            sblocks += [
                pad_rows(w[:, :width]),
                pad_rows(w[:, width : width + latent_dim].sum(1, keepdims=True)),
                pad_rows(w[:, width + latent_dim :]),
            ]
        else:
            sblocks += [
                pad_rows(w[:, :width]),
                pad_rows(w[:, width:].sum(1, keepdims=True)),
            ]
        sblocks.append(pad_rows(bias(style_params, f"layer_{i}")))
    wout = kern(style_params, "rgb_out")  # [3, width + L]
    sblocks += [pad_rows(wout[:, :width]),
                pad_rows(wout[:, width:].sum(1, keepdims=True)),
                pad_rows(bias(style_params, "rgb_out"))]
    w_style = np.concatenate(sblocks, axis=1)

    pmat_c, phase_c = _encoding_matrices(num_freq_coor)
    enc = np.zeros((max(64, ec), 4), np.float32)
    enc[:ec, :3] = pmat_c
    enc[:ec, 3:4] = phase_c

    return (jnp.asarray(w_trunk, dtype), jnp.asarray(w_style, dtype),
            jnp.asarray(wsig, dtype), jnp.asarray(enc, jnp.float32))


def _make_kernel(depth: int, skip: int, num_freq_coor: int, style_d: int,
                 style_width: int, latent_dim: int, trunk_width: int,
                 n_chunks: int = 2):
    """``n_chunks`` splits the tile into independent sub-tiles so Mosaic
    can overlap one chunk's VPU epilogues (sin/relu/sigmoid/cast) with
    another's MXU matmuls (same trick as
    tgtc.ops.pallas.nerf_mlp._make_kernel; identical math per point)."""
    ec = 6 * num_freq_coor
    in_c = 3 + ec
    width = style_width
    tw = trunk_width

    def kernel(pts_ref, lat_ref, wt_ref, ws_ref, wsig_ref, enc_ref,
               rgb_ref, sigma_ref):
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        enc = enc_ref[:]
        pmat_c, phase_c = enc[:ec, 0:3], enc[:ec, 3:4]
        wt, ws, wsig = wt_ref[:], ws_ref[:], wsig_ref[:]

        def chunk_body(sl):
            pts = pts_ref[:, sl].astype(f32)  # [3, T]
            e_c = jnp.concatenate(
                [pts, jnp.sin(mm(pmat_c, pts) + phase_c)], axis=0
            ).astype(bf16)  # [in_c, T]

            # ---------------- trunk
            off = 0

            def take_t(cols, rows=tw):
                nonlocal off
                blk = wt[:rows, off : off + cols]
                off += cols
                return blk

            w0, b0 = take_t(in_c), take_t(1)
            h = jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
            for i in range(1, depth):
                if i == skip + 1:
                    wx, wh, b = take_t(in_c), take_t(tw), take_t(1)
                    h = mm(wh, h) + mm(wx, e_c) + b.astype(f32)
                else:
                    wh, b = take_t(tw), take_t(1)
                    h = mm(wh, h) + b.astype(f32)
                h = jnp.maximum(h, 0.0).astype(bf16)

            sigma = mm(wsig[:1, :tw], h) + wsig[:1, tw:].astype(f32)

            wrm, brm = take_t(tw, rows=TRUNK_W), take_t(1, rows=TRUNK_W)
            br = jnp.maximum(mm(wrm, h) + brm.astype(f32), 0.0).astype(bf16)

            # ---------------- style chain
            lat = lat_ref[:, sl].astype(bf16)          # [latent_dim, T]
            lat_mean = jnp.mean(lat.astype(f32), axis=0, keepdims=True)
            # fused [e_c ; 0-pad ; lat] operand — layers 0/skip read both
            # through ONE matmul (shared MXU K-tile; see pack_style_params)
            ecp = ((in_c + 7) // 8) * 8
            el = jnp.concatenate(
                [e_c,
                 jnp.zeros((ecp - in_c, e_c.shape[1]), bf16),
                 lat], axis=0)                          # [ecp+L, T]

            soff = 0

            def take_s(cols, r=width):
                nonlocal soff
                blk = ws[:r, soff : soff + cols]
                soff += cols
                return blk

            # concat MLP
            n_concat = min(style_d - 1, skip + 1)
            el_cols = ecp + latent_dim
            cf = None
            for i in range(n_concat):
                if i == 0:
                    w_el, b = take_s(el_cols), take_s(1)
                    acc = mm(w_el, el) + b.astype(f32)
                elif i == skip:
                    wh, w_el, b = (take_s(width), take_s(el_cols),
                                   take_s(1))
                    acc = mm(wh, cf) + mm(w_el, el) + b.astype(f32)
                else:
                    wh, wl, b = take_s(width), take_s(latent_dim), take_s(1)
                    acc = mm(wh, cf) + mm(wl, lat) + b.astype(f32)
                cf = jnp.maximum(acc, 0.0).astype(bf16)

            # style MLP (latent = rank-1 scalar-mean term)
            s = None
            for i in range(style_d - 1):
                if i == 0:
                    wbr, wcf, wx, wls, b = (take_s(TRUNK_W), take_s(width),
                                            take_s(in_c), take_s(1), take_s(1))
                    acc = (mm(wbr, br) + mm(wcf, cf) + mm(wx, e_c)
                           + wls.astype(f32) * lat_mean + b.astype(f32))
                elif i == skip:
                    wh, wls, wx, b = (take_s(width), take_s(1), take_s(in_c),
                                      take_s(1))
                    acc = (mm(wh, s) + wls.astype(f32) * lat_mean
                           + mm(wx, e_c) + b.astype(f32))
                else:
                    wh, wls, b = take_s(width), take_s(1), take_s(1)
                    acc = mm(wh, s) + wls.astype(f32) * lat_mean + b.astype(f32)
                s = jnp.maximum(acc, 0.0).astype(bf16)

            wo, wol, bo = (take_s(width, r=max(width, TRUNK_W)), take_s(1),
                           take_s(1))
            rgb = jax.nn.sigmoid(
                mm(wo[:3], s) + wol[:3].astype(f32) * lat_mean
                + bo[:3].astype(f32)
            )

            rgb_ref[:, sl] = rgb.astype(rgb_ref.dtype)
            sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)

        tile = pts_ref.shape[1]
        chunks = n_chunks if tile % n_chunks == 0 else 1
        for c in range(chunks):
            chunk_body(slice(c * (tile // chunks), (c + 1) * (tile // chunks)))

    return kernel


def _make_sigma_kernel(depth: int, skip: int, num_freq_coor: int,
                       trunk_width: int, n_chunks: int = 2):
    """Trunk→sigma only — for passes whose output feeds nothing but the
    compositing weights (the stylized COARSE pass: sample_pdf consumes
    weights, coarse rgb is discarded, /root/reference/rendering.py:118-136
    computes it anyway). Reads the same packed ``w_trunk``/``wsig``/``enc``
    buffers as the full kernel; the base_remap/style columns are simply
    never touched. ~37% of the full chain's MXU passes."""
    ec = 6 * num_freq_coor
    in_c = 3 + ec
    tw = trunk_width

    def kernel(pts_ref, wt_ref, wsig_ref, enc_ref, sigma_ref):
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        enc = enc_ref[:]
        pmat_c, phase_c = enc[:ec, 0:3], enc[:ec, 3:4]
        wt, wsig = wt_ref[:], wsig_ref[:]

        def chunk_body(sl):
            pts = pts_ref[:, sl].astype(f32)
            e_c = jnp.concatenate(
                [pts, jnp.sin(mm(pmat_c, pts) + phase_c)], axis=0
            ).astype(bf16)

            off = 0

            def take_t(cols):
                nonlocal off
                blk = wt[:tw, off : off + cols]
                off += cols
                return blk

            w0, b0 = take_t(in_c), take_t(1)
            h = jnp.maximum(mm(w0, e_c) + b0.astype(f32), 0.0).astype(bf16)
            for i in range(1, depth):
                if i == skip + 1:
                    wx, wh, b = take_t(in_c), take_t(tw), take_t(1)
                    h = mm(wh, h) + mm(wx, e_c) + b.astype(f32)
                else:
                    wh, b = take_t(tw), take_t(1)
                    h = mm(wh, h) + b.astype(f32)
                h = jnp.maximum(h, 0.0).astype(bf16)

            sigma = mm(wsig[:1, :tw], h) + wsig[:1, tw:].astype(f32)
            sigma_ref[:, sl] = sigma.astype(sigma_ref.dtype)

        tile = pts_ref.shape[1]
        chunks = n_chunks if tile % n_chunks == 0 else 1
        for c in range(chunks):
            chunk_body(slice(c * (tile // chunks), (c + 1) * (tile // chunks)))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skip", "num_freq_coor", "trunk_width",
                     "tile", "interpret"),
)
def fused_sigma_apply_t(
    w_trunk: jnp.ndarray,
    w_sig: jnp.ndarray,
    enc: jnp.ndarray,
    pts_t: jnp.ndarray,     # [3, P]
    depth: int = 8,
    skip: int = 4,
    num_freq_coor: int = 10,
    trunk_width: int = 256,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ sigma [1, P] from the packed style-kernel buffers (trunk only)."""
    p = pts_t.shape[1]
    assert p % tile == 0, (p, tile)
    pts_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_sigma_kernel(depth, skip, num_freq_coor, trunk_width),
        grid=(p // tile,),
        in_specs=[pts_spec, full(w_trunk), full(w_sig), full(enc)],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.float32),
        interpret=interpret,
    )(pts_t, w_trunk, w_sig, enc)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skip", "num_freq_coor", "style_d",
                     "style_width", "latent_dim", "trunk_width", "tile",
                     "interpret"),
)
def fused_style_apply_t(
    w_trunk: jnp.ndarray,
    w_style: jnp.ndarray,
    w_sig: jnp.ndarray,
    enc: jnp.ndarray,
    pts_t: jnp.ndarray,     # [3, P]
    lat_t: jnp.ndarray,     # [latent_dim, P] (per-point latent, pre-broadcast)
    depth: int = 8,
    skip: int = 4,
    num_freq_coor: int = 10,
    style_d: int = 8,
    style_width: int = 256,
    latent_dim: int = 32,
    trunk_width: int = 256,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (stylized rgb [3, P], sigma [1, P]). P must be a tile multiple."""
    p = pts_t.shape[1]
    assert p % tile == 0, (p, tile)
    grid = (p // tile,)

    pts_spec = pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    lat_spec = pl.BlockSpec((latent_dim, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

    rgb, sigma = pl.pallas_call(
        _make_kernel(depth, skip, num_freq_coor, style_d, style_width,
                     latent_dim, trunk_width),
        grid=grid,
        in_specs=[pts_spec, lat_spec, full(w_trunk), full(w_style),
                  full(w_sig), full(enc)],
        out_specs=(
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
        ),
        interpret=interpret,
    )(pts_t, lat_t, w_trunk, w_style, w_sig, enc)
    return rgb, sigma
