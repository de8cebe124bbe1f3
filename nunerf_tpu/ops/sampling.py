"""Importance sampling along rays (NeRF/NeuS), TPU-native.

Reference semantics: ``sample_pdf`` (field.py:468-498), NeuS ``upsample`` /
``cat_z_vals`` (renderer.py:537-583), and the secondary-ray ``get_weights`` /
``get_intersection`` march (field.py:501-554).

TPU-first notes:
* the inverse-CDF bin search is a comparison-count (O(B*S) VPU ops, no
  data-dependent gather chains) — faster than binary search at these sizes
  and fully vectorized;
* ``get_intersection`` is fixed-shape: the reference boolean-compacts to
  inside-sphere rays; here every lane computes and results are masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nunerf_tpu.ops.geometry import get_sphere_intersection


def _searchsorted_right(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(cdf, u, right=True)``.

    cdf: [..., B]; u: [..., S] -> int32 [..., S].
    """
    return jnp.sum((cdf[..., None, :] <= u[..., :, None]), axis=-1).astype(jnp.int32)


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` new z values per ray.

    bins: [..., B] sorted sample positions; weights: [..., B-1].
    Matches field.py:468-498 numerics (+1e-5 floor, midpoint/det grid).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., B]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples,
                         dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert rng is not None, "stochastic sample_pdf needs an rng key"
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def neus_upsample(rays_o, rays_d, z_vals, sdf, n_importance: int, inv_s) -> jnp.ndarray:
    """One NeuS hierarchical up-sampling round with fixed inv_s
    (renderer.py:537-567).  All inputs static-shape; returns [R, n_importance].
    """
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    return jax.lax.stop_gradient(sample_pdf(z_vals, weights, n_importance, det=True))


import os

_MERGE_RANK = os.environ.get("NUNERF_MERGE_RANK", "0") not in ("0", "false", "")


def merge_z_vals(z_vals, new_z_vals, sdf, new_sdf=None):
    """Sorted merge of sample positions (renderer.py:569-583).

    Returns (z_vals_sorted, sdf_sorted_or_None).

    Both inputs are already sorted ascending, so instead of a full
    ``argsort`` over the concatenation (a log^2-depth sort network on TPU)
    the default path computes each element's merged rank by a comparison
    count against the OTHER list (O(S1*S2) VPU ops, no data-dependent
    control flow), inverts the permutation with a one-hot contraction, and
    gathers — identical output to the stable argsort (ties keep ``z_vals``
    first).  NUNERF_MERGE_RANK=0 restores the argsort path.
    """
    z = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    s = None if new_sdf is None else jnp.concatenate([sdf, new_sdf], axis=-1)
    if not _MERGE_RANK:
        order = jnp.argsort(z, axis=-1)
    else:
        s1 = z_vals.shape[-1]
        s2 = new_z_vals.shape[-1]
        # merged rank of each element (stable: z_vals wins ties)
        r1 = jnp.arange(s1) + jnp.sum(
            new_z_vals[..., None, :] < z_vals[..., :, None], axis=-1)
        r2 = jnp.arange(s2) + jnp.sum(
            z_vals[..., None, :] <= new_z_vals[..., :, None], axis=-1)
        rank = jnp.concatenate([r1, r2], axis=-1)          # [.., S] a permutation
        # inverse permutation via one-hot contraction (no scatter); f32
        # accumulation is exact for these small integers and VPU-friendly
        n = s1 + s2
        onehot = (rank[..., None] == jnp.arange(n)).astype(jnp.float32)
        order = jnp.einsum("...sk,s->...k", onehot,
                           jnp.arange(n, dtype=jnp.float32)).astype(jnp.int32)
    z = jnp.take_along_axis(z, order, axis=-1)
    if s is None:
        return z, None
    return z, jnp.take_along_axis(s, order, axis=-1)


def get_weights(sdf_fn, inv_s_fn, z_vals, origins, dirs):
    """NeuS weights along secondary rays (field.py:501-521).

    sdf_fn: [N,3] -> [N,1]; inv_s_fn: [N,3] -> [N,1].
    z_vals: [P, S]; origins/dirs: [P, 3].
    Returns (weights [P,S-1], mid_sdf [P,S-1]).
    """
    pts = z_vals[..., None] * dirs[:, None, :] + origins[:, None, :]  # P,S,3
    p, s = pts.shape[0], pts.shape[1]
    inv_s = inv_s_fn(pts[:, :-1, :].reshape(-1, 3)).reshape(p, s - 1)
    sdf = sdf_fn(pts.reshape(-1, 3)).reshape(p, s)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    surface_mask = cos_val < 0
    cos_val = jnp.minimum(cos_val, 0.0)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5) * surface_mask
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    mid_sdf = jnp.where(surface_mask, mid_sdf, -1.0)
    return weights, mid_sdf


def get_intersection(sdf_fn, inv_s_fn, pts, dirs, sn0: int = 128, sn1: int = 9):
    """Secondary-ray NeuS march -> hit distance distribution
    (field.py:524-554).  Fixed shape: rays starting outside the 0.999 sphere
    produce zero weights / -1 sdf instead of being compacted away.

    Returns (hit_z_vals [P,sn1-1], hit_weights [P,sn1-1], hit_sdf [P,sn1-1]);
    everything is stop-gradient (used as ground truth for the occlusion loss).
    """
    inside = jnp.linalg.norm(pts, axis=-1) < 0.999  # [P]
    # Clamp outside pts to safe values so the march is well-defined everywhere.
    safe_pts = jnp.where(inside[:, None], pts, jnp.zeros_like(pts))
    max_dist = get_sphere_intersection(safe_pts, dirs)  # [P,1]

    z_vals = jnp.linspace(0.0, 1.0, sn0, dtype=pts.dtype)[None, :] * max_dist
    weights, mid_sdf = get_weights(sdf_fn, inv_s_fn, z_vals, safe_pts, dirs)
    z_new = sample_pdf(z_vals, weights, sn1, det=True)
    weights, mid_sdf = get_weights(sdf_fn, inv_s_fn, z_new, safe_pts, dirs)
    z_mid = (z_new[:, 1:] + z_new[:, :-1]) * 0.5

    inside_f = inside[:, None]
    hit_z = jnp.where(inside_f, z_mid, 0.0)
    hit_w = jnp.where(inside_f, weights, 0.0)
    hit_sdf = jnp.where(inside_f, mid_sdf, -1.0)
    return (jax.lax.stop_gradient(hit_z),
            jax.lax.stop_gradient(hit_w),
            jax.lax.stop_gradient(hit_sdf))
