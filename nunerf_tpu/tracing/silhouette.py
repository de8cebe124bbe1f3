"""Silhouette-edge visibility sampling and two-bounce transparent tracing.

TPU-native equivalents of the reference ``Scene`` extras that round out its
mesh-optimization API (``network/DiffRender.py``):

* ``silhouette_edges``       — DiffRender.py:469-481
* ``edge_sample_coverage``   — the ``primary_edge_sample`` autograd.Function
                               (:193-285) as a ``jax.custom_vjp``
* ``primary_visibility``     — :483-526
* ``Scene.refract_ray/trace2/render_transparent/render_mask`` (:551-594,
  444-462) live on ``tracing.scene.Scene``.

Design notes (TPU-first): the reference compacts silhouette edges and hit
rays with boolean indexing; here everything is fixed-shape with validity
masks, so the whole pipeline stays jittable.  Gradients of pixel coverage
w.r.t. vertex positions flow through the differentiable projection of edge
endpoints into a custom VJP whose cotangent is the edge-sampling estimate
(hit(above) - hit(below)) x 2D edge normal — the same estimator the
reference's backward implements.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nunerf_tpu.tracing.mesh_reg import MeshTopology


def silhouette_edges(verts, topo: MeshTopology, origin) -> jnp.ndarray:
    """Mask [E] of edges whose two faces face opposite sides of ``origin``
    (DiffRender.py:469-481).  Non-differentiable (detached in the reference).
    """
    verts = jax.lax.stop_gradient(jnp.asarray(verts))
    tris = jnp.asarray(topo.tris)
    ef = jnp.asarray(topo.edge_faces)  # [E,2], -1 pad
    v0 = jnp.take(verts, tris[:, 0], axis=0)
    v1 = jnp.take(verts, tris[:, 1], axis=0)
    v2 = jnp.take(verts, tris[:, 2], axis=0)
    fn = jnp.cross(v1 - v0, v2 - v0)  # [F,3] (unnormalized is fine for sign)

    def facing(f):
        n = jnp.take(fn, f, axis=0)
        p = jnp.take(v0, f, axis=0)
        return jnp.sum(n * (origin[None, :] - p), axis=-1) > 0

    has2 = ef[:, 1] >= 0
    f0 = facing(jnp.maximum(ef[:, 0], 0))
    f1 = facing(jnp.maximum(ef[:, 1], 0))
    return has2 & jnp.logical_xor(f0, f1)


@jax.custom_vjp
def edge_sample_coverage(e_pos, f):
    """Coverage sample value at each edge midpoint pixel (constant 0.5, as in
    primary_edge_sample:271); the VJP routes the incoming cotangent to the
    2D edge endpoints as g * f * (-N) per endpoint (:251-257,282-285).

    e_pos: [E,2,2] projected edge endpoints (pixels); f: [E] hit(above) -
    hit(below) along the 2D edge normal (non-differentiable data).
    """
    return 0.5 * jnp.ones(e_pos.shape[0], e_pos.dtype)


def _cov_fwd(e_pos, f):
    return edge_sample_coverage(e_pos, f), (e_pos, f)


def _cov_bwd(res, g):
    e_pos, f = res
    ax, ay = e_pos[:, 0, 0], e_pos[:, 0, 1]
    bx, by = e_pos[:, 1, 0], e_pos[:, 1, 1]
    nx, ny = ay - by, bx - ax  # 2D normal of alpha(x,y) (:210-212)
    scale = (g * f)[:, None]
    d_endpoint = jnp.stack([-nx, -ny], axis=-1) * scale  # same for a and b
    d_e_pos = jnp.stack([d_endpoint, d_endpoint], axis=1)
    return d_e_pos, None


edge_sample_coverage.defvjp(_cov_fwd, _cov_bwd)


def primary_visibility(scene, pose, K, origin, res_hw, verts=None,
                       detach_depth: bool = False) -> Dict[str, jnp.ndarray]:
    """Edge-sampled differentiable primary visibility (DiffRender.py:483-526).

    scene: tracing.scene.Scene (closest-hit oracle); pose: world->cam [3,4]
    (NeRO convention, same as the ray store); K: [3,3]; origin: camera
    position [3]; res_hw: (h, w).  ``verts`` optionally overrides the vertex
    array so an optimization loop can differentiate w.r.t. its own copy.

    Returns fixed-shape dict {index [E,2] int32 pixel coords, value [E],
    valid [E]}; gradients of ``value`` flow to ``verts`` through the
    projected endpoints.
    """
    h, w = res_hw
    verts = scene.verts if verts is None else verts
    topo = scene.topology
    silh = silhouette_edges(verts, topo, jnp.asarray(origin))

    edges = jnp.asarray(topo.edges)  # [E,2]
    va = jnp.take(verts, edges[:, 0], axis=0)
    vb = jnp.take(verts, edges[:, 1], axis=0)

    R, t = jnp.asarray(pose[:, :3]), jnp.asarray(pose[:, 3])

    def project(v):
        cam = v @ R.T + t  # [E,3], +z forward (OpenCV)
        z = jnp.maximum(cam[:, 2:3], 1e-6)
        if detach_depth:
            z = jax.lax.stop_gradient(z)
        uv = cam[:, :2] / z
        return jnp.stack([uv[:, 0] * K[0, 0] + K[0, 2],
                          uv[:, 1] * K[1, 1] + K[1, 2]], axis=-1)

    e_pos = jnp.stack([project(va), project(vb)], axis=1)  # [E,2,2]

    # sample midpoints offset +-1px along the 2D normal (:205-218)
    mid = 0.5 * (e_pos[:, 0] + e_pos[:, 1])
    n2 = jnp.stack([e_pos[:, 0, 1] - e_pos[:, 1, 1],
                    e_pos[:, 1, 0] - e_pos[:, 0, 0]], axis=-1)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-8)
    pu = jax.lax.stop_gradient(mid + n2)
    pl = jax.lax.stop_gradient(mid - n2)

    def pixel_rays(p):
        d_cam = jnp.stack([(p[:, 0] - K[0, 2]) / K[0, 0],
                           (p[:, 1] - K[1, 2]) / K[1, 1],
                           jnp.ones(p.shape[0])], axis=-1)
        d = d_cam @ R  # R^T rows applied -> world
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        o = jnp.broadcast_to(origin[None, :], d.shape)
        return o, d

    ou, du = pixel_rays(pu)
    ol, dl = pixel_rays(pl)
    hit_u = scene.intersect(ou, du).hit
    hit_l = scene.intersect(ol, dl).hit
    f = jax.lax.stop_gradient(hit_u.astype(jnp.float32)
                              - hit_l.astype(jnp.float32))

    value = edge_sample_coverage(e_pos, jnp.where(silh, f, 0.0))
    index = jax.lax.stop_gradient(mid).astype(jnp.int32)
    in_view = ((index[:, 0] >= 0) & (index[:, 0] < w - 1)
               & (index[:, 1] >= 0) & (index[:, 1] < h - 1))
    return {"index": index, "value": value,
            "valid": silh & in_view & (jnp.abs(f) > 1e-5)}
