"""Ray/sphere/refraction geometry primitives.

Covers the reference helpers in ``network/field.py:447-464`` (sphere ops),
``network/DiffRender.py:28-58`` (Reflect/Refract/Fresnel), and
``network/renderer.py:337-344`` (near/far from the unit bounding sphere).

All functions are pure, static-shape, and differentiable; TIR ("total internal
reflection") is reported as a mask instead of data-dependent branching so they
compose under ``jit``/``vmap``/``shard_map``.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def safe_norm(v, axis=-1, keepdims=False, eps: float = 1e-12):
    """Norm with a finite gradient at v = 0 (plain ``jnp.linalg.norm`` emits
    NaN cotangents at exactly zero, which ``where`` does not block)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def safe_sqrt(x, eps: float = 1e-12):
    return jnp.sqrt(jnp.maximum(x, eps))


def normalize(v, eps: float = 1e-12):
    return v / safe_norm(v, keepdims=True, eps=eps * eps)


def reflect(wo, n):
    """Mirror direction of ``wo`` about normal ``n`` (DiffRender.py:28-30)."""
    return -wo + 2.0 * dot(wo, n) * n


def refract(wi, n, eta):
    """Snell refraction of incident dir ``wi`` (pointing *away* from surface)
    across normal ``n`` with relative IoR ``eta = n_i / n_t``.

    Returns ``(wt, tir_mask)``: the transmitted direction (unnormalized zeros
    where TIR) and a boolean mask of total internal reflection.
    Matches DiffRender.py:32-46 semantics.
    """
    cos_i = dot(wi, n)  # [...,1]
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    tir = sin2_t[..., 0] >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = eta * -wi + (eta * cos_i - cos_t) * n
    wt = jnp.where(tir[..., None], jnp.zeros_like(wt), wt)
    return wt, tir


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized Fresnel reflectance for a dielectric interface
    (DiffRender.py:48-58).  ``cos_i`` >= 0 assumed; returns reflectance in
    [0, 1], 1.0 under TIR.
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_t = eta_i / eta_t * jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = ((eta_t * cos_i - eta_i * cos_t)
              / jnp.maximum(eta_t * cos_i + eta_i * cos_t, 1e-10))
    r_perp = ((eta_i * cos_i - eta_t * cos_t)
              / jnp.maximum(eta_i * cos_i + eta_t * cos_t, 1e-10))
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, jnp.ones_like(fr), fr)


def schlick_weight(no_v):
    """Schlick approximation ``0.04 + 0.96 (1-NoV)^5`` (field.py:708-712)."""
    t = jnp.clip(1.0 - no_v, 0.0, 1.0)
    return jnp.clip(0.04 + (1.0 - 0.04) * t * t * t * t * t, 0.0, 1.0)


def get_sphere_intersection(pts, dirs):
    """Distance along ``dirs`` from ``pts`` (inside unit sphere) to the unit
    sphere (field.py:458-464).  Shape [..., 1]."""
    dtx = dot(pts, dirs)
    xtx = dot(pts, pts)
    disc = dtx * dtx - xtx + 1.0
    return -dtx + jnp.sqrt(jnp.maximum(disc, 0.0) + 1e-6)


def offset_points_to_sphere(points, radius: float = 0.999):
    """Clamp points to lie strictly inside the unit sphere (field.py:447-455)."""
    norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
    scaled = points / jnp.maximum(norm, 1e-12) * radius
    return jnp.where(norm > radius, scaled, points)


def near_far_from_sphere(rays_o, rays_d):
    """NeuS near/far: the +-1 chord around the closest approach to the origin
    (renderer.py:337-344).  rays: [...,3] -> ([...,1], [...,1])."""
    a = dot(rays_d, rays_d)
    b = 2.0 * dot(rays_o, rays_d)
    mid = 0.5 * (-b) / a
    near = jnp.maximum(mid - 1.0, 1e-3)
    far = mid + 1.0
    return near, far


def ray_sphere_hit(rays_o, rays_d, radius: float = 1.0):
    """Both intersection distances with a ``radius`` sphere at the origin.

    Returns (t_near, t_far, hit_mask); t's are zero where no hit.
    """
    b = dot(rays_o, rays_d)[..., 0]
    c = dot(rays_o, rays_o)[..., 0] - radius * radius
    disc = b * b - c
    hit = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit, -b - sq, 0.0), jnp.where(hit, -b + sq, 0.0), hit


def camera_plane_intersection(pts, dirs, poses):
    """Intersection of rays with the camera XoY plane in "human" coordinates
    (field.py:411-430).  poses: [...,3,4] world->human transform.

    Returns (inter [...,3], dist [...], hits [...]).
    """
    R, t = poses[..., :, :3], poses[..., :, 3:]
    pts_h = (R @ pts[..., :, None] + t)[..., 0]
    dirs_h = (R @ dirs[..., :, None])[..., 0]
    hits = jnp.abs(dirs_h[..., 2]) > 1e-4
    dirs_z = jnp.where(hits, dirs_h[..., 2], 1e-4)
    dist = -pts_h[..., 2] / dirs_z
    inter = pts_h + dist[..., None] * dirs_h
    return inter, dist, hits
