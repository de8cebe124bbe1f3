"""Differentiable mesh scene: the stage-2 tracing substrate.

Re-design of the reference ``Scene`` (``network/DiffRender.py:318-608``): mesh
load + per-vertex angle-weighted normals + Gaussian curvature (init_VN :342-360),
closest-hit queries, and the differentiable hit: a non-differentiable on-chip
closest-hit sweep followed by differentiable Möller–Trumbore re-intersection
against the hit triangle, interpolating vertex normal and curvature
(Dintersect :539-549).

Everything the jitted path touches is a fixed-shape jnp array held on device;
the host side only runs at construction.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.ops.geometry import normalize
from nunerf_tpu.tracing.intersect import (
    MISS_T,
    Hit,
    build_tile_index,
    diff_intersect,
    pad_triangles,
    ray_mesh_intersect,
    ray_mesh_intersect_culled,
)
from nunerf_tpu.tracing.mesh_ops import load_ply, vertex_normals_curvature


class Scene:
    """``use_pallas`` switches the closest-hit sweep to the Pallas kernel
    (ops/pallas_intersect.py).  Measured on v5e at ~100k triangles the tuned
    XLA scan (tile=1024) is slightly faster, so it is the default; the
    kernel is kept as the substrate for tile-culled traversal."""

    def __init__(self, mesh: Union[str, Tuple[np.ndarray, np.ndarray]],
                 tile: int = 1024, use_pallas: bool = False,
                 cull_threshold: int = None, curv_smooth_iters: int = 0):
        if isinstance(mesh, str):
            verts, tris = load_ply(mesh)
        else:
            verts, tris = mesh
        self.verts_np = np.asarray(verts, np.float32)
        self.tris_np = np.asarray(tris, np.int32)
        normals, curvature = vertex_normals_curvature(self.verts_np, self.tris_np)
        if curv_smooth_iters > 0:
            # marched meshes carry sign-noise in the raw angle-defect field;
            # the shell refraction branches on curvature sign, so shell-mode
            # scenes diffuse it (see mesh_ops.smooth_vertex_scalar)
            from nunerf_tpu.tracing.mesh_ops import smooth_vertex_scalar
            curvature = smooth_vertex_scalar(curvature, self.tris_np,
                                             curv_smooth_iters)
        self.tile = tile
        self.use_pallas = use_pallas
        # above this triangle count, closest-hit switches from the brute
        # Möller–Trumbore sweep to nearest-first tile-culled descent (the
        # BVH stand-in; bvh.cu:255-301) — brute force wins below it because
        # the slab-test/sort preamble isn't free
        if cull_threshold is None:
            import os
            cull_threshold = int(os.environ.get("NUNERF_CULL_TRIS", 32768))
        self.tile_index = None
        self.cull_group = 16
        if not use_pallas and len(self.tris_np) >= cull_threshold:
            # √n tile law (round 5): with a FIXED tile size the tile count —
            # and with it the per-ray slab sweep and nearest-first sort —
            # grows linearly with the mesh, which measured 963× time for 16×
            # triangles (docs/perf_notes.md r4).  Growing the tile with
            # √n_tris keeps n_tiles ~ √n (the reference's BVH pays log depth
            # instead, bvh.cu:526-610).  The divisor keeps the tuned 117k-tri
            # operating point (tile=128) unchanged; group shrinks for big
            # tiles so the per-round candidate gather stays ~4k triangles.
            from nunerf_tpu.tracing.intersect import auto_tile_params
            cull_tile, self.cull_group = auto_tile_params(len(self.tris_np))
            self.tile_index = build_tile_index(
                self.verts_np, self.tris_np, tile=cull_tile,
                group=self.cull_group)

        pad_to = tile
        if use_pallas:
            from nunerf_tpu.ops.pallas_intersect import TRI_TILE
            pad_to = max(tile, TRI_TILE) * (tile // np.gcd(tile, TRI_TILE))
        v0, e1, e2 = pad_triangles(self.verts_np, self.tris_np, pad_to)
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.verts = jnp.asarray(self.verts_np)
        self.tris = jnp.asarray(self.tris_np)
        self.vertex_normals = jnp.asarray(normals)
        self.vertex_curvature = jnp.asarray(curvature)

    # ------------------------------------------------------------------
    def intersect(self, rays_o, rays_d) -> Hit:
        """Non-differentiable closest-hit query (OptiX stand-in)."""
        if self.use_pallas:
            import jax
            from nunerf_tpu.ops.pallas_intersect import pallas_ray_mesh_intersect
            interpret = jax.default_backend() == "cpu"
            t, idx, hit = pallas_ray_mesh_intersect(
                jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
                self.v0, self.e1, self.e2, interpret=interpret)
            return Hit(t=t, tri_idx=idx, hit=hit)
        if self.tile_index is not None:
            return ray_mesh_intersect_culled(rays_o, rays_d, self.tile_index,
                                             group=self.cull_group)
        return ray_mesh_intersect(rays_o, rays_d, self.v0, self.e1, self.e2,
                                  tile=self.tile)

    def dintersect(self, rays_o, rays_d) -> Dict[str, jnp.ndarray]:
        """Differentiable intersection (DiffRender.py:539-549 pattern).

        Returns dict: pos [R,3], normal (interp., normalized, flipped toward
        the ray origin side) [R,3], geo_normal [R,3], curvature [R,1],
        t [R,1], hit [R] bool.  Missed lanes carry safe dummy values.
        """
        hit = self.intersect(rays_o, rays_d)
        tri = jnp.take(self.tris, hit.tri_idx, axis=0)  # [R,3]
        tv0 = jnp.take(self.verts, tri[:, 0], axis=0)
        tv1 = jnp.take(self.verts, tri[:, 1], axis=0)
        tv2 = jnp.take(self.verts, tri[:, 2], axis=0)

        t, u, v, valid = diff_intersect(rays_o, rays_d, tv0, tv1, tv2)
        w = 1.0 - u - v
        n0 = jnp.take(self.vertex_normals, tri[:, 0], axis=0)
        n1 = jnp.take(self.vertex_normals, tri[:, 1], axis=0)
        n2 = jnp.take(self.vertex_normals, tri[:, 2], axis=0)
        normal = normalize(w * n0 + u * n1 + v * n2)
        c0 = jnp.take(self.vertex_curvature, tri[:, 0])
        c1 = jnp.take(self.vertex_curvature, tri[:, 1])
        c2 = jnp.take(self.vertex_curvature, tri[:, 2])
        curvature = (w[..., 0] * c0 + u[..., 0] * c1 + v[..., 0] * c2)[..., None]

        geo_normal = normalize(jnp.cross(tv1 - tv0, tv2 - tv0))
        pos = rays_o + t * rays_d

        ok = hit.hit & valid
        safe_t = jnp.where(ok[:, None], t, MISS_T)
        return {
            "pos": jnp.where(ok[:, None], pos, rays_o),
            "normal": jnp.where(ok[:, None], normal, jnp.zeros_like(normal)),
            "geo_normal": jnp.where(ok[:, None], geo_normal,
                                    jnp.zeros_like(geo_normal)),
            "curvature": jnp.where(ok[:, None], curvature,
                                   jnp.zeros_like(curvature)),
            "t": safe_t,
            "hit": ok,
            "tri_idx": hit.tri_idx,
        }

    # ------------------------------------------------------------------
    @property
    def topology(self):
        """Lazy watertight edge table (DiffRender.py:362-379) for the
        silhouette / regularizer API."""
        if not hasattr(self, "_topology"):
            from nunerf_tpu.tracing.mesh_reg import build_topology
            self._topology = build_topology(self.tris_np, len(self.verts_np))
        return self._topology

    def refract_ray(self, inter: Dict[str, jnp.ndarray], rays_d,
                    ext_ior: float = 1.00029, int_ior: float = 1.5):
        """Snell refraction at a dintersect result (DiffRender.py:551-583):
        entering/exiting chosen by the normal side, Fresnel + TIR computed
        with swapped IoRs on exit.  Returns (new_o, new_d, refracted_mask).
        Fixed shape — the reference's ``new_ray.select(refracted)`` boolean
        compaction becomes a carried mask."""
        from nunerf_tpu.ops.geometry import dot, refract

        n = inter["normal"]
        wo = -rays_d
        cos_i = jnp.clip(dot(wo, n), -1.0, 1.0)
        entering = cos_i[..., 0] > 0
        n = jnp.where(entering[:, None], n, -n)
        eta = jnp.where(entering[:, None], ext_ior / int_ior,
                        int_ior / ext_ior)
        wt, tir = refract(wo, n, eta)
        new_o = inter["pos"] + 1e-5 * wt
        ok = inter["hit"] & ~tir
        return new_o, wt, ok

    def trace2(self, rays_o, rays_d, ext_ior: float = 1.00029,
               int_ior: float = 1.5):
        """Two refraction bounces through the mesh (DiffRender.py:585-594).
        Returns (o, d, ok): the exit rays; lanes that missed or TIR'd at
        either interface carry ok=False (original rays retained)."""
        i1 = self.dintersect(rays_o, rays_d)
        o1, d1, ok1 = self.refract_ray(i1, rays_d, ext_ior, int_ior)
        o1 = jnp.where(ok1[:, None], o1, rays_o)
        d1 = jnp.where(ok1[:, None], d1, rays_d)
        i2 = self.dintersect(o1, d1)
        o2, d2, ok2 = self.refract_ray(i2, d1, ext_ior, int_ior)
        ok = ok1 & ok2
        return (jnp.where(ok[:, None], o2, rays_o),
                jnp.where(ok[:, None], d2, rays_d), ok)

    def render_transparent(self, rays_o, rays_d, ext_ior: float = 1.00029,
                           int_ior: float = 1.5):
        """Exit rays of transparent two-bounce transport
        (DiffRender.py:444-457): refract in, refract out, and keep only rays
        that then escape the mesh.  Returns (out_o, out_d, mask)."""
        o2, d2, ok = self.trace2(rays_o, rays_d, ext_ior, int_ior)
        escaped = ~self.intersect(o2, d2).hit
        mask = ok & escaped
        z = jnp.zeros_like(rays_o)
        return (jnp.where(mask[:, None], o2, z),
                jnp.where(mask[:, None], d2, z), mask)

    def render_mask(self, rays_o, rays_d):
        """Binary hit mask (DiffRender.py:458-462)."""
        return self.intersect(rays_o, rays_d).hit.astype(jnp.float32)

    def silhouette_edge(self, origin):
        """Silhouette-edge mask wrt a viewpoint (DiffRender.py:469-481);
        returns (edges [E,2], mask [E]) — fixed shape, no compaction."""
        from nunerf_tpu.tracing.silhouette import silhouette_edges
        return (jnp.asarray(self.topology.edges),
                silhouette_edges(self.verts, self.topology,
                                 jnp.asarray(origin)))

    def primary_visibility(self, pose, K, origin, res_hw, verts=None,
                           detach_depth: bool = False):
        """Edge-sampled differentiable visibility (DiffRender.py:483-526)."""
        from nunerf_tpu.tracing.silhouette import primary_visibility
        return primary_visibility(self, jnp.asarray(pose), jnp.asarray(K),
                                  jnp.asarray(origin), res_hw, verts=verts,
                                  detach_depth=detach_depth)

    # ------------------------------------------------------------------
    def unsigned_distance(self, points: np.ndarray, chunk: int = 4096):
        """Point-to-mesh distance — used by the stage-2 mesh postprocess
        (postprocess_stage2_mesh.py:9-26).  Jitted tiled sweep (the former
        unfused-numpy version streamed ~GB of temporaries per chunk and took
        minutes on host)."""
        v0 = self.verts_np[self.tris_np[:, 0]]
        v1 = self.verts_np[self.tris_np[:, 1]]
        v2 = self.verts_np[self.tris_np[:, 2]]
        out = np.empty(len(points), np.float32)
        for i0 in range(0, len(points), chunk):
            p = jnp.asarray(points[i0:i0 + chunk], jnp.float32)
            out[i0:i0 + chunk] = np.asarray(
                _point_triangle_dist(p, jnp.asarray(v0), jnp.asarray(v1),
                                     jnp.asarray(v2)))
        return out


@partial(jax.jit, static_argnames=("tile",))
def _point_triangle_dist(p, v0, v1, v2, tile: int = 1024):
    """min over triangles of point-triangle distance (clamped barycentric
    projection).  p: [P,3]; v*: [T,3] -> [P]."""
    nt = v0.shape[0]
    pad = (-nt) % tile
    if pad:
        big = jnp.full((pad, 3), 1e6, v0.dtype)
        v0 = jnp.concatenate([v0, big], 0)
        v1 = jnp.concatenate([v1, big], 0)
        v2 = jnp.concatenate([v2, big], 0)

    def body(best, tri):
        t0, t1, t2 = tri
        e0 = t1 - t0  # [tile,3]
        e1 = t2 - t0
        a = jnp.sum(e0 * e0, -1)
        b = jnp.sum(e0 * e1, -1)
        c = jnp.sum(e1 * e1, -1)
        det = jnp.maximum(a * c - b * b, 1e-20)
        diff = p[:, None, :] - t0[None, :, :]  # [P,tile,3]
        d = jnp.sum(diff * e0[None], -1)
        e = jnp.sum(diff * e1[None], -1)
        s = jnp.clip((c * d - b * e) / det, 0.0, 1.0)
        t = jnp.clip((a * e - b * d) / det, 0.0, 1.0)
        scale = jnp.where(s + t > 1, 1.0 / jnp.maximum(s + t, 1e-12), 1.0)
        s, t = s * scale, t * scale
        closest = t0[None] + s[..., None] * e0[None] + t[..., None] * e1[None]
        dist2 = jnp.sum((p[:, None, :] - closest) ** 2, -1)
        return jnp.minimum(best, jnp.min(dist2, axis=1)), None

    tiles = (v0.reshape(-1, tile, 3), v1.reshape(-1, tile, 3),
             v2.reshape(-1, tile, 3))
    init = jnp.full((p.shape[0],), jnp.inf, p.dtype)
    best, _ = jax.lax.scan(body, init, tiles)
    return jnp.sqrt(jnp.maximum(best, 0.0))
