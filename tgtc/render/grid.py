"""Density-grid proposal: skip the coarse MLP entirely.

The reference's coarse network exists only to steer fine sampling — it
evaluates a full NeRF MLP on 64 uniform samples per ray every frame
(/root/reference/utils.py:509-531 uniform sampling; rendering.py:27-36
per-ray coarse eval). After Phase A the density field is FROZEN for every
downstream phase, so its σ can be snapshotted ONCE into a dense voxel grid
and the per-frame coarse pass becomes a trilinear (or nearest) gather —
the TPU-native analog of occupancy grids (Instant-NGP/NerfAcc-style empty
-space skipping), kept static-shape: the grid steers the SAME resample /
sample-budget machinery (ops.sampling), so ray and sample counts never
become data-dependent.

Opt-in (``Config.sigma_grid``); default off keeps exact reference parity.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static (compile-time) grid geometry; the voxel VALUES are a traced
    operand so one compiled render serves any checkpoint's grid."""

    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]
    interp: str = "trilinear"  # or "nearest"

    def __post_init__(self):
        if self.interp not in ("trilinear", "nearest"):
            raise ValueError(f"interp {self.interp!r}")
        if not all(h > l for l, h in zip(self.lo, self.hi)):
            raise ValueError(f"degenerate grid bounds {self.lo} {self.hi}")


def sample_sigma_grid(values: jnp.ndarray, spec: GridSpec,
                      pts: jnp.ndarray) -> jnp.ndarray:
    """Sample a [Gx, Gy, Gz] σ grid at ``pts [..., 3]`` (ray-space coords,
    NDC for llff scenes). Out-of-bounds points clamp to the border voxel —
    rays never leave the frustum the grid was built over, so the border is
    only ever grazed by fp jitter."""
    g = jnp.asarray(values.shape, jnp.float32)
    lo = jnp.asarray(spec.lo, jnp.float32)
    hi = jnp.asarray(spec.hi, jnp.float32)
    u = (pts - lo) / (hi - lo) * (g - 1.0)

    gx, gy, gz = values.shape
    flat = values.reshape(-1)

    def gather(ix, iy, iz):
        return jnp.take(flat, (ix * gy + iy) * gz + iz, axis=0)

    if spec.interp == "nearest":
        u = jnp.clip(jnp.round(u), 0.0, g - 1.0).astype(jnp.int32)
        return gather(u[..., 0], u[..., 1], u[..., 2])

    u = jnp.clip(u, 0.0, g - 1.0 - 1e-6)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    i1 = jnp.minimum(i0 + 1, jnp.asarray(values.shape) - 1)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = gather(x0, y0, z0) * (1 - fx) + gather(x1, y0, z0) * fx
    c01 = gather(x0, y0, z1) * (1 - fx) + gather(x1, y0, z1) * fx
    c10 = gather(x0, y1, z0) * (1 - fx) + gather(x1, y1, z0) * fx
    c11 = gather(x0, y1, z1) * (1 - fx) + gather(x1, y1, z1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def ray_bounds(rays_o, rays_d, near: float, far: float,
               margin: float = 0.01) -> Tuple[Tuple, Tuple]:
    """Axis-aligned bounds of the sampled volume: min/max over the near
    and far endpoints of every ray (sampling is linear in t, so the
    extremes are at the endpoints), padded by ``margin`` of the extent.
    Device arrays reduce ON DEVICE (only 6 floats cross to host — the ray
    tensors can be hundreds of MB on a slow fetch path)."""
    if isinstance(rays_o, jax.Array):
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        ends = jnp.stack([ro + near * rd, ro + far * rd])
        lo = np.asarray(jnp.min(ends, axis=(0, 1)))
        hi = np.asarray(jnp.max(ends, axis=(0, 1)))
    else:
        a = np.asarray(rays_o) + near * np.asarray(rays_d)
        b = np.asarray(rays_o) + far * np.asarray(rays_d)
        pts = np.concatenate([a.reshape(-1, 3), b.reshape(-1, 3)], 0)
        lo, hi = pts.min(0), pts.max(0)
    pad = (hi - lo) * margin + 1e-6
    return tuple((lo - pad).tolist()), tuple((hi + pad).tolist())


def build_sigma_grid(
    packed_fine,           # (w1, w2, enc) packed fine-trunk weights
    spec: GridSpec,
    resolution: Tuple[int, int, int],
    depth: int = 8,
    num_freq_coor: int = 10,
    width: int = 256,
    tile: int = 4096,
    interpret: bool = False,
    chunk: int = 262144,
) -> jnp.ndarray:
    """Snapshot the FINE trunk's σ on a dense lattice (one-time cost per
    checkpoint, ~seconds on TPU; the per-frame coarse MLP then never runs
    again). σ is max-pooled over each voxel's 8 lattice corners offset by
    half a cell so thin surfaces between lattice points still register —
    conservative in the only direction that matters for a proposal
    (over-estimating σ wastes a few fine samples; under-estimating loses
    surfaces)."""
    from tgtc.ops.pallas.nerf_mlp import fused_nerf_sigma_apply_t

    gx, gy, gz = resolution
    lo = np.asarray(spec.lo, np.float32)
    hi = np.asarray(spec.hi, np.float32)
    axes = [np.linspace(lo[i], hi[i], n, dtype=np.float32)
            for i, n in enumerate(resolution)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    cell = (hi - lo) / (np.asarray(resolution, np.float32) - 1)

    @jax.jit
    def sigma_of(p):  # [N, 3] -> [N]
        sig_t = fused_nerf_sigma_apply_t(
            *packed_fine, p.T, depth=depth, num_freq_coor=num_freq_coor,
            width=width, tile=tile, interpret=interpret)
        return sig_t.reshape(-1)

    n = pts.shape[0]
    offsets = np.concatenate([
        np.zeros((1, 3), np.float32),  # the lattice point itself
        np.stack(np.meshgrid(*([[-0.5, 0.5]] * 3), indexing="ij"),
                 -1).reshape(-1, 3) * cell,
    ], 0)
    out = np.empty((n,), np.float32)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        block = pts[start:end]
        if end - start < chunk:  # pad to the compiled shape
            block = np.concatenate(
                [block, np.zeros((chunk - (end - start), 3), np.float32)], 0)
        acc = None
        for off in offsets:
            s = sigma_of(jnp.asarray(block + off.astype(np.float32)))
            acc = s if acc is None else jnp.maximum(acc, s)
        out[start:end] = np.asarray(acc)[: end - start]
    return jnp.asarray(out.reshape(gx, gy, gz))


def save_sigma_grid(path: str, values, spec: GridSpec) -> None:
    np.savez_compressed(path, values=np.asarray(values),
                        lo=np.asarray(spec.lo), hi=np.asarray(spec.hi),
                        interp=spec.interp)


def load_sigma_grid(path: str) -> Tuple[jnp.ndarray, GridSpec]:
    z = np.load(path, allow_pickle=False)
    spec = GridSpec(lo=tuple(z["lo"].tolist()), hi=tuple(z["hi"].tolist()),
                    interp=str(z["interp"]))
    return jnp.asarray(z["values"]), spec
