"""Pallas TPU kernel: ray/triangle-mesh closest-hit sweep.

The XLA version (tracing/intersect.py) materializes [R, tile] intermediates
that spill to HBM; this kernel tiles both rays and triangles so every
Möller–Trumbore plane lives in VMEM, with the triangle soup streamed through
the grid.  Grid = (ray_blocks, tri_tiles); the output block depends only on
the ray-block index, so per-ray best-hit state accumulates across the
sequential tri-tile dimension (standard TPU revisiting pattern).

Replaces the role of the reference's OptiX launch (cuda/triangle.cu raygen /
closesthit) and the CUDA BVH traversal (raytracing/src/bvh.cu) — except the
result is computed inside the jitted step with zero host round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISS_T = 1e7

# RAY_BLOCK must match the 1-D f32 VMEM tiling (1024) so the dynamic
# best-t stores are provably aligned; TRI_TILE sized so the ~8 live
# [RAY_BLOCK, TRI_TILE] planes fit VMEM.
RAY_BLOCK = 1024
TRI_TILE = 256


def _mt_kernel(rays_o_ref, rays_d_ref, v0_ref, e1_ref, e2_ref,
               best_t_ref, best_i_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = pl.ds(pl.multiple_of(i * RAY_BLOCK, RAY_BLOCK), RAY_BLOCK)

    @pl.when(j == 0)
    def _():
        best_t_ref[row] = jnp.full((RAY_BLOCK,), MISS_T, jnp.float32)
        best_i_ref[row] = jnp.zeros((RAY_BLOCK,), jnp.int32)

    # rays: [RB, 1] per component; triangles: [1, TT] per component
    ox = rays_o_ref[:, 0:1]
    oy = rays_o_ref[:, 1:2]
    oz = rays_o_ref[:, 2:3]
    dx = rays_d_ref[:, 0:1]
    dy = rays_d_ref[:, 1:2]
    dz = rays_d_ref[:, 2:3]
    v0x = v0_ref[:, 0][None, :]
    v0y = v0_ref[:, 1][None, :]
    v0z = v0_ref[:, 2][None, :]
    e1x = e1_ref[:, 0][None, :]
    e1y = e1_ref[:, 1][None, :]
    e1z = e1_ref[:, 2][None, :]
    e2x = e2_ref[:, 0][None, :]
    e2y = e2_ref[:, 1][None, :]
    e2z = e2_ref[:, 2][None, :]

    # pvec = d x e2
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = pvx * e1x + pvy * e1y + pvz * e1z
    eps = 1e-9
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    # tvec = o - v0
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (qvx * dx + qvy * dy + qvz * dz) * inv_det
    t = (qvx * e2x + qvy * e2y + qvz * e2z) * inv_det

    valid = ((jnp.abs(det) > eps) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > 1e-5))
    t = jnp.where(valid, t, MISS_T)

    tmin = jnp.min(t, axis=-1)                       # [RB]
    imin = jnp.argmin(t, axis=-1).astype(jnp.int32)  # [RB]
    base = j * TRI_TILE
    prev_t = best_t_ref[row]
    prev_i = best_i_ref[row]
    better = tmin < prev_t
    best_i_ref[row] = jnp.where(better, imin + base, prev_i)
    best_t_ref[row] = jnp.where(better, tmin, prev_t)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_ray_mesh_intersect(rays_o, rays_d, v0, e1, e2, interpret=False):
    """Closest hit over padded triangle arrays (multiples of TRI_TILE).

    rays are padded to a RAY_BLOCK multiple internally.
    Returns (t [R], tri_idx [R], hit [R]).
    """
    rn = rays_o.shape[0]
    pad = (-rn) % RAY_BLOCK
    if pad:
        rays_o = jnp.concatenate(
            [rays_o, jnp.zeros((pad, 3), rays_o.dtype)], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0)
    rp = rays_o.shape[0]
    nt = v0.shape[0]
    grid = (rp // RAY_BLOCK, nt // TRI_TILE)

    best_t, best_i = pl.pallas_call(
        _mt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRI_TILE, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRI_TILE, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRI_TILE, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp,), jnp.float32),
            jax.ShapeDtypeStruct((rp,), jnp.int32),
        ],
        interpret=interpret,
    )(rays_o, rays_d, v0, e1, e2)

    best_t = best_t[:rn]
    best_i = best_i[:rn]
    return best_t, best_i, best_t < MISS_T * 0.5
