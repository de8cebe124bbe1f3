"""SDF sphere tracing.

Re-design of the reference ``network/tracing.py:96-216``: vanilla sphere
tracing (bounding-sphere entry, fixed max iterations, convergence threshold)
plus finite-difference / autodiff surface normals.  The reference runs a
Python loop of 200 iterations; here it is a ``lax.while_loop`` with per-lane
convergence masks, fully jittable and batched.

The main reconstruction path intersects the extracted mesh instead (as in
the reference, renderer.py:10 imports this but traces the mesh); sphere
tracing remains useful for SDF debugging, visualization, and secondary-ray
queries without a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nunerf_tpu.ops.geometry import normalize, ray_sphere_hit


class SphereTraceResult(NamedTuple):
    points: jnp.ndarray      # [R,3] final positions
    depth: jnp.ndarray       # [R,1] distance along ray
    hit: jnp.ndarray         # [R] converged mask
    iterations: jnp.ndarray  # [] iterations used


def sphere_trace(sdf_fn: Callable, rays_o, rays_d, max_iters: int = 200,
                 threshold: float = 1e-5, bound_radius: float = 1.0,
                 step_scale: float = 1.0) -> SphereTraceResult:
    """March each ray by the SDF value until |sdf| < threshold.

    Rays that miss the bounding sphere or leave it during the march are
    reported as misses (reference tracing.py:96-164 semantics).
    """
    rays_d = normalize(rays_d)
    t_near, t_far, sphere_hit = ray_sphere_hit(rays_o, rays_d, bound_radius)
    t0 = jnp.maximum(t_near, 0.0)[:, None]
    t_far = t_far[:, None]

    def cond(state):
        t, done, it = state
        return (it < max_iters) & jnp.any(~done)

    def body(state):
        t, done, it = state
        pts = rays_o + t * rays_d
        d = sdf_fn(pts)
        converged = jnp.abs(d[..., 0]) < threshold
        escaped = t[..., 0] > t_far[..., 0]
        newly_done = converged | escaped | ~sphere_hit
        t_new = jnp.where(done[:, None] | newly_done[:, None],
                          t, t + d * step_scale)
        return t_new, done | newly_done, it + 1

    done0 = ~sphere_hit
    t, done, iters = jax.lax.while_loop(
        cond, body, (t0, done0, jnp.asarray(0, jnp.int32)))

    pts = rays_o + t * rays_d
    final_sdf = sdf_fn(pts)
    hit = sphere_hit & (jnp.abs(final_sdf[..., 0]) < threshold * 10)
    return SphereTraceResult(points=pts, depth=t, hit=hit, iterations=iters)


def sdf_normals(sdf_fn: Callable, points, eps: float = 0.0):
    """Surface normals: autodiff (eps=0) or central finite differences
    (reference tracing.py:189-216 uses finite differences)."""
    if eps <= 0:
        def single(p):
            return sdf_fn(p[None])[0, 0]
        return normalize(jax.vmap(jax.grad(single))(points))
    offsets = jnp.eye(3) * eps
    grads = []
    for i in range(3):
        d_pos = sdf_fn(points + offsets[i])
        d_neg = sdf_fn(points - offsets[i])
        grads.append((d_pos - d_neg)[..., 0] / (2 * eps))
    return normalize(jnp.stack(grads, axis=-1))
