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


# ---------------------------------------------------------------------------
# Tile-culled traversal: the TPU-native answer to the reference's 4-wide CUDA
# BVH (raytracing/src/bvh.cu:255-301 traversal, :526-610 build).  A per-lane
# stack machine is hostile to the VPU; instead triangles are Morton-sorted
# into spatially coherent fixed-size tiles with precomputed AABBs, every ray
# slab-tests all tile AABBs (cheap: ~30 flops/pair), sorts tiles by entry
# distance, and a lax.while_loop sweeps tiles in nearest-first order, K tiles
# per round, until no ray's next tile can beat its current best hit.  Work
# per ray is O(K*T) per round (typically 1-2 rounds) instead of O(total
# triangles); shapes stay static so XLA tiles everything onto the VPU.
# Exact: a hit is only accepted over tiles whose entry-t precedes it, so the
# early exit is conservative (same guarantee as sorted BVH descent).
# ---------------------------------------------------------------------------


class TileIndex(NamedTuple):
    v0: jnp.ndarray    # [n_tiles, T, 3] tile-grouped triangle origin
    e1: jnp.ndarray    # [n_tiles, T, 3]
    e2: jnp.ndarray    # [n_tiles, T, 3]
    lo: jnp.ndarray    # [n_tiles, 3] tile AABB min (+inf for padding tiles)
    hi: jnp.ndarray    # [n_tiles, 3] tile AABB max (-inf for padding tiles)
    perm: jnp.ndarray  # [n_tiles * T] int32: padded slot -> original tri idx


def _morton3(q: "np.ndarray") -> "np.ndarray":
    """Interleave 10-bit x/y/z (q: [N,3] uint32 in [0,1024)) -> 30-bit code."""
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def build_tile_index(verts, tris, tile: int = 128, group: int = 16) -> TileIndex:
    """Host-side build (construction time only, like the reference's BVH
    build): Morton-sort triangles by centroid, group into ``tile``-sized
    tiles, record per-tile AABBs.  Tile count is padded to a multiple of
    ``group`` with never-hit tiles (lo=+inf)."""
    import numpy as np
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    cent = verts[tris].mean(1)
    lo_all, hi_all = cent.min(0), cent.max(0)
    scale = np.where(hi_all > lo_all, hi_all - lo_all, 1.0)
    q = np.clip(((cent - lo_all) / scale * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(q), kind="stable").astype(np.int32)

    n = len(tris)
    n_tiles = -(-n // tile)
    n_tiles += (-n_tiles) % group
    slots = n_tiles * tile
    perm = np.zeros(slots, np.int32)
    perm[:n] = order

    tv = verts[tris[order]]                       # [n, 3verts, 3]
    v0 = np.full((slots, 3), 1e8, np.float32)     # degenerate padding
    e1 = np.zeros((slots, 3), np.float32)
    e2 = np.zeros((slots, 3), np.float32)
    v0[:n] = tv[:, 0]
    e1[:n] = tv[:, 1] - tv[:, 0]
    e2[:n] = tv[:, 2] - tv[:, 0]

    vmin = np.full((slots, 3), np.inf, np.float32)
    vmax = np.full((slots, 3), -np.inf, np.float32)
    vmin[:n] = tv.min(1)
    vmax[:n] = tv.max(1)
    lo = vmin.reshape(n_tiles, tile, 3).min(1)
    hi = vmax.reshape(n_tiles, tile, 3).max(1)

    return TileIndex(
        v0=jnp.asarray(v0.reshape(n_tiles, tile, 3)),
        e1=jnp.asarray(e1.reshape(n_tiles, tile, 3)),
        e2=jnp.asarray(e2.reshape(n_tiles, tile, 3)),
        lo=jnp.asarray(lo), hi=jnp.asarray(hi), perm=jnp.asarray(perm))


def _mt_per_ray(rays_o, rays_d, v0, e1, e2, eps=1e-9):
    """Per-ray MT test: rays [R,3] x per-ray candidates [R,C,3] -> t [R,C].
    Same math (and tolerances) as ``_moller_trumbore_tile``."""
    pvec = jnp.cross(rays_d[:, None, :], e2)
    det = jnp.sum(pvec * e1, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = rays_o[:, None, :] - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * rays_d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2, axis=-1) * inv_det
    tol = 1e-6
    valid = ((jnp.abs(det) > eps) & (u >= -tol) & (v >= -tol)
             & (u + v <= 1.0 + tol) & (t > 1e-5))
    return jnp.where(valid, t, MISS_T)


@partial(jax.jit, static_argnames=("group",))
def ray_mesh_intersect_culled(rays_o, rays_d, index: TileIndex,
                              group: int = 16) -> Hit:
    """Closest-hit via nearest-first tile descent (see module comment above).

    Equivalent results to ``ray_mesh_intersect`` (tri_idx may differ where
    two triangles share the exact same t, e.g. along shared edges)."""
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)
    n_tiles, T, _ = index.v0.shape
    rn = rays_o.shape[0]

    # slab entry-t for every (ray, tile); chunked scan keeps the [R, chunk, 3]
    # temporaries bounded at mask-render ray counts
    safe_d = jnp.where(jnp.abs(rays_d) < 1e-12,
                       jnp.where(rays_d >= 0, 1e-12, -1e-12), rays_d)
    inv_d = 1.0 / safe_d
    chunk = min(n_tiles, 512)
    pad = (-n_tiles) % chunk
    lo_p, hi_p = index.lo, index.hi
    if pad:  # pad with never-hit boxes (lo=+inf -> slab test misses)
        lo_p = jnp.concatenate([lo_p, jnp.full((pad, 3), jnp.inf)], 0)
        hi_p = jnp.concatenate([hi_p, jnp.full((pad, 3), -jnp.inf)], 0)
    lo_c = lo_p.reshape(-1, chunk, 3)
    hi_c = hi_p.reshape(-1, chunk, 3)

    def slab(_, lohis):
        lo, hi = lohis
        t0 = (lo[None] - rays_o[:, None, :]) * inv_d[:, None, :]
        t1 = (hi[None] - rays_o[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        entry = jnp.where(tf >= jnp.maximum(tn, 0.0),
                          jnp.maximum(tn, 0.0), MISS_T)
        return None, entry

    _, entry = jax.lax.scan(slab, None, (lo_c, hi_c))   # [n_chunks, R, chunk]
    entry = jnp.moveaxis(entry, 1, 0).reshape(rn, -1)[:, :n_tiles]

    tile_ids = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[None], entry.shape)
    order_entry, order_idx = jax.lax.sort_key_val(entry, tile_ids,
                                                  dimension=-1)
    n_groups = n_tiles // group

    def next_entry(g):
        col = jax.lax.dynamic_slice(order_entry, (0, g * group), (rn, 1))
        return col[:, 0]

    def cond(st):
        g, best_t, _ = st
        return (g < n_groups) & jnp.any(next_entry(jnp.minimum(
            g, n_groups - 1)) < best_t)

    def body(st):
        g, best_t, best_i = st
        tiles = jax.lax.dynamic_slice(order_idx, (0, g * group), (rn, group))
        tent = jax.lax.dynamic_slice(order_entry, (0, g * group), (rn, group))
        cand_v0 = index.v0[tiles].reshape(rn, group * T, 3)
        cand_e1 = index.e1[tiles].reshape(rn, group * T, 3)
        cand_e2 = index.e2[tiles].reshape(rn, group * T, 3)
        t = _mt_per_ray(rays_o, rays_d, cand_v0, cand_e1, cand_e2)
        # a tile whose entry can't beat the current best can't improve —
        # masking it keeps the early exit conservative AND exact
        live = tent < best_t[:, None]                       # [R, group]
        t = jnp.where(jnp.repeat(live, T, axis=1), t, MISS_T)
        tmin = jnp.min(t, axis=-1)
        c = jnp.argmin(t, axis=-1).astype(jnp.int32)
        tile_of = jnp.take_along_axis(tiles, (c // T)[:, None], 1)[:, 0]
        oid = index.perm[tile_of * T + (c % T)]
        better = tmin < best_t
        return (g + 1,
                jnp.where(better, tmin, best_t),
                jnp.where(better, oid, best_i))

    init = (jnp.int32(0), jnp.full((rn,), MISS_T), jnp.zeros((rn,), jnp.int32))
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    return Hit(t=best_t, tri_idx=best_i, hit=best_t < MISS_T * 0.5)


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


def auto_tile_params(n_tris: int) -> Tuple[int, int]:
    """√n tile law (round 5): tile grows with mesh size so the tile count —
    and with it the per-ray slab sweep and nearest-first sort — stays ~√n
    instead of linear (fixed 128-tri tiles measured 963× time for 16×
    triangles, docs/perf_notes.md r4; the reference's BVH pays log depth,
    bvh.cu:526-610).  The 2.7 divisor keeps the tuned 117k-tri operating
    point (tile=128) unchanged; group shrinks for big tiles so the per-round
    candidate gather stays ~4k triangles.  Returns (tile, group)."""
    import numpy as np
    t_pow = int(round(np.log2(max(np.sqrt(n_tris) / 2.7, 128.0))))
    tile = int(np.clip(2 ** t_pow, 128, 2048))
    group = max(4, min(16, 4096 // tile))
    return tile, group
