"""Split-sum environment BRDF lookup table (the "FG" term).

The reference ships a precomputed 256x256x2 binary asset sampled with
nvdiffrast (``network/field.py:583-584,721-722``).  We instead *compute* the
table with the standard Karis split-sum preintegration (GGX importance
sampling, Smith visibility, Schlick Fresnel weight) at first use and cache it
on disk; the table axes are (u = NoV, v = roughness).

The lookup itself is a plain bilinear gather in JAX (clamp boundary, linear
filter — matching nvdiffrast's ``filter_mode='linear', boundary_mode='clamp'``).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


def _hammersley(n: int) -> np.ndarray:
    """n x 2 low-discrepancy points (van der Corput radical inverse base 2)."""
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | ((bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | ((bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | ((bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | ((bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    y = bits.astype(np.float64) * 2.3283064365386963e-10
    x = i.astype(np.float64) / n
    return np.stack([x, y], axis=-1)


def compute_fg_lut(res: int = 256, n_samples: int = 512) -> np.ndarray:
    """Integrate the split-sum BRDF -> [res, res, 2] float32 (A, B)."""
    xi = _hammersley(n_samples)  # [S,2]
    uv = (np.arange(res, dtype=np.float64) + 0.5) / res
    nov = uv[:, None]            # rows: NoV        [R,1]
    rough = uv[None, :]          # cols: roughness  [1,R]

    nov_g = np.broadcast_to(nov, (res, res)).reshape(-1, 1)      # [T,1]
    rough_g = np.broadcast_to(rough, (res, res)).reshape(-1, 1)  # [T,1]
    alpha = rough_g**2

    vx = np.sqrt(np.maximum(0.0, 1.0 - nov_g**2))
    vz = nov_g

    a_sum = np.zeros((res * res, 1))
    b_sum = np.zeros((res * res, 1))
    chunk = 64
    for s0 in range(0, n_samples, chunk):
        x = xi[s0:s0 + chunk]
        phi = 2.0 * np.pi * x[None, :, 0]                 # [1,C]
        cos_th = np.sqrt((1.0 - x[None, :, 1])
                         / (1.0 + (alpha**2 - 1.0) * x[None, :, 1]))  # [T,C]
        sin_th = np.sqrt(np.maximum(0.0, 1.0 - cos_th**2))
        hx = sin_th * np.cos(phi)
        hy = sin_th * np.sin(phi)
        hz = cos_th
        voh = vx * hx + vz * hz                           # [T,C]
        lx = 2.0 * voh * hx - vx
        lz = 2.0 * voh * hz - vz
        nol = np.maximum(lz, 0.0)
        noh = np.maximum(hz, 0.0)
        voh = np.maximum(voh, 0.0)
        valid = nol > 0

        k = alpha / 2.0
        g_v = nov_g / np.maximum(nov_g * (1.0 - k) + k, 1e-8)
        g_l = nol / np.maximum(nol * (1.0 - k) + k, 1e-8)
        g = g_v * g_l
        g_vis = np.where(valid, g * voh / np.maximum(noh * nov_g, 1e-8), 0.0)
        fc = (1.0 - voh) ** 5
        a_sum += np.sum((1.0 - fc) * g_vis, axis=-1, keepdims=True)
        b_sum += np.sum(fc * g_vis, axis=-1, keepdims=True)

    lut = np.concatenate([a_sum, b_sum], axis=-1) / n_samples
    return lut.reshape(res, res, 2).astype(np.float32)


@lru_cache(maxsize=None)
def get_fg_lut(res: int = 256) -> np.ndarray:
    os.makedirs(_ASSET_DIR, exist_ok=True)
    path = os.path.join(_ASSET_DIR, f"fg_lut_{res}.npy")
    if os.path.exists(path):
        return np.load(path)
    lut = compute_fg_lut(res)
    np.save(path, lut)
    return lut


def fg_lookup(lut: jnp.ndarray, no_v: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LUT sample.  lut: [R,R,2]; no_v/roughness: [...,1] in [0,1].

    Returns [..., 2].  Row axis is NoV, column axis roughness (matching the
    reference's ``fg_uv = cat([NoV, roughness])`` texture sample).
    """
    r = lut.shape[0]
    u = jnp.clip(no_v[..., 0], 0.0, 1.0) * r - 0.5
    v = jnp.clip(roughness[..., 0], 0.0, 1.0) * r - 0.5
    u0 = jnp.clip(jnp.floor(u), 0, r - 1).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, r - 1).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, r - 1)
    v1 = jnp.minimum(v0 + 1, r - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    c00 = lut[u0, v0]
    c01 = lut[u0, v1]
    c10 = lut[u1, v0]
    c11 = lut[u1, v1]
    return ((1 - fu) * (1 - fv) * c00 + (1 - fu) * fv * c01
            + fu * (1 - fv) * c10 + fu * fv * c11)
