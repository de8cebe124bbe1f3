"""On-chip ray/triangle-mesh intersection (replaces OptiX).

The reference ships rays through a GPU->CPU->OptiX->CPU->GPU round trip three
times per training step (``network/tracing_optix.py:154-158`` — SURVEY.md
calls it the single biggest performance sin).  Here intersection runs *on the
TPU inside the jitted step*: a tiled brute-force Möller–Trumbore sweep —
``lax.scan`` over triangle tiles carrying the per-ray best hit.  At stage-2
mesh sizes (decimated outer shells, 1e4-1e5 triangles) this is bandwidth-bound
streaming through the VPU with zero divergence, no host sync, and exact
results; gradients are recovered as the reference does (DiffRender.py:539-549)
by differentiably re-intersecting only the hit triangle.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

MISS_T = 1e7  # reference miss depth sentinel (cuda/triangle.cu miss = 10000000)


class Hit(NamedTuple):
    t: jnp.ndarray        # [R] hit distance (MISS_T where miss)
    tri_idx: jnp.ndarray  # [R] int32 triangle index (0 where miss)
    hit: jnp.ndarray      # [R] bool


def _moller_trumbore_tile(rays_o, rays_d, v0, e1, e2, eps=1e-9):
    """All-pairs MT test: rays [R,3] x triangle tile [T,3] -> t [R,T]
    (inf where miss).  No backface culling (glass needs both sides)."""
    # pvec = d x e2 : [R,T,3]
    pvec = jnp.cross(rays_d[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # [R,T]
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = rays_o[:, None, :] - v0[None, :, :]  # [R,T,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * rays_d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
    # small negative barycentric tolerance: rays through shared vertices /
    # edges (e.g. a mesh pole) otherwise miss EVERY adjacent triangle once
    # f32 rounding pushes u or v epsilon-negative (watertightness gap of
    # per-triangle MT; OptiX solves this in hardware).  Harmless for
    # closest-hit: at worst a shared edge double-counts the same t.
    # CAVEAT: the tolerance is absolute (u,v are barycentric, so its width
    # in world units scales with triangle size) — fine for closest-hit on
    # unit-bound scenes, but do NOT reuse this kernel for hit-count-parity
    # (inside/outside) queries: a shared edge can register two hits at the
    # same t.
    tol = 1e-6
    valid = ((jnp.abs(det) > eps) & (u >= -tol) & (v >= -tol)
             & (u + v <= 1.0 + tol) & (t > 1e-5))
    return jnp.where(valid, t, MISS_T)


@partial(jax.jit, static_argnames=("tile",))
def ray_mesh_intersect(rays_o, rays_d, v0, e1, e2, tile: int = 2048) -> Hit:
    """Closest-hit query.  v0/e1/e2: [T,3] padded to a multiple of ``tile``
    (pad with degenerate triangles at v0=inf).  Non-differentiable (use
    ``diff_intersect`` on the hit triangle for gradients)."""
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)
    n_tiles = v0.shape[0] // tile
    v0t = v0.reshape(n_tiles, tile, 3)
    e1t = e1.reshape(n_tiles, tile, 3)
    e2t = e2.reshape(n_tiles, tile, 3)

    rn = rays_o.shape[0]
    init = (jnp.full((rn,), MISS_T), jnp.zeros((rn,), jnp.int32))

    def body(carry, xs):
        best_t, best_i = carry
        v0c, e1c, e2c, base = xs
        t = _moller_trumbore_tile(rays_o, rays_d, v0c, e1c, e2c)  # [R,tile]
        tmin = jnp.min(t, axis=-1)
        imin = jnp.argmin(t, axis=-1).astype(jnp.int32) + base
        better = tmin < best_t
        return ((jnp.where(better, tmin, best_t),
                 jnp.where(better, imin, best_i)), None)

    bases = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)
    (best_t, best_i), _ = jax.lax.scan(body, init, (v0t, e1t, e2t, bases))
    return Hit(t=best_t, tri_idx=best_i, hit=best_t < MISS_T * 0.5)


def pad_triangles(verts, tris, tile: int = 2048):
    """Precompute (v0, e1, e2) arrays padded to a tile multiple.

    Padding uses far-away degenerate triangles that can never be hit.
    """
    import numpy as np
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    n = len(v0)
    pad = (-n) % tile
    if pad:
        v0 = np.concatenate([v0, np.full((pad, 3), 1e8, np.float32)], 0)
        e1 = np.concatenate([e1, np.zeros((pad, 3), np.float32)], 0)
        e2 = np.concatenate([e2, np.zeros((pad, 3), np.float32)], 0)
    return (v0.astype(np.float32), e1.astype(np.float32), e2.astype(np.float32))


def diff_intersect(rays_o, rays_d, tv0, tv1, tv2):
    """Differentiable Möller–Trumbore re-intersection against known triangles
    (one per ray), the reference's gradient-recovery trick
    (DiffRender.py:62-125 ``JIT_Dintersect``).

    tv0/tv1/tv2: [R,3] vertices of each ray's hit triangle.
    Returns (t [R,1], u [R,1], v [R,1], valid [R]).
    """
    e1 = tv1 - tv0
    e2 = tv2 - tv0
    pvec = jnp.cross(rays_d, e2)
    det = jnp.sum(pvec * e1, axis=-1, keepdims=True)
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    inv_det = 1.0 / safe_det
    tvec = rays_o - tv0
    u = jnp.sum(tvec * pvec, axis=-1, keepdims=True) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * rays_d, axis=-1, keepdims=True) * inv_det
    t = jnp.sum(qvec * e2, axis=-1, keepdims=True) * inv_det
    valid = (jnp.abs(det[..., 0]) > 1e-12)
    return t, u, v, valid
