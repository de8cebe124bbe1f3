"""Split-sum environment BRDF lookup table (the "FG" term).

The reference ships a precomputed 256x256x2 binary asset sampled with
nvdiffrast (``network/field.py:583-584,721-722``).  We instead *compute* the
table with split-sum preintegration (GGX importance sampling with
alpha = roughness^2, Smith height-correlated visibility, Schlick Fresnel
weight) at first use and cache it on disk.  This formulation was identified
by numerically matching the reference's ``assets/bsdf_256_256.bin``: it
agrees to Monte-Carlo noise (~1e-3 mean), whereas the Karis separable
Smith-Schlick variant differs by up to 0.32 at grazing angles
(tests/test_torch_parity.py pins the match).

Layout matches the reference asset / nvdiffrast texture convention:
rows (v) = roughness, cols (u) = NoV.  The lookup is a plain bilinear
gather in JAX (clamp boundary, linear filter — matching nvdiffrast's
``filter_mode='linear', boundary_mode='clamp'``).
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


def compute_fg_lut(res: int = 256, n_samples: int = 4096) -> np.ndarray:
    """Integrate the split-sum BRDF -> [res, res, 2] float32 (A, B).

    Rows = roughness, cols = NoV (the reference asset's layout)."""
    xi = _hammersley(n_samples)  # [S,2]
    uv = (np.arange(res, dtype=np.float64) + 0.5) / res
    rough = uv[:, None]          # rows: roughness  [R,1]
    nov = uv[None, :]            # cols: NoV        [1,R]

    rough_g = np.broadcast_to(rough, (res, res)).reshape(-1, 1)  # [T,1]
    nov_g = np.broadcast_to(nov, (res, res)).reshape(-1, 1)      # [T,1]
    alpha = rough_g**2
    alpha2 = alpha**2

    vx = np.sqrt(np.maximum(0.0, 1.0 - nov_g**2))
    vz = nov_g

    a_sum = np.zeros((res * res, 1))
    b_sum = np.zeros((res * res, 1))
    chunk = 64
    for s0 in range(0, n_samples, chunk):
        x = xi[s0:s0 + chunk]
        phi = 2.0 * np.pi * x[None, :, 0]                 # [1,C]
        cos_th = np.sqrt((1.0 - x[None, :, 1])
                         / (1.0 + (alpha2 - 1.0) * x[None, :, 1]))  # [T,C]
        sin_th = np.sqrt(np.maximum(0.0, 1.0 - cos_th**2))
        hx = sin_th * np.cos(phi)
        hy = sin_th * np.sin(phi)
        hz = cos_th
        voh = vx * hx + vz * hz                           # [T,C]
        lz = 2.0 * voh * hz - vz
        nol = np.maximum(lz, 0.0)
        noh = np.maximum(hz, 0.0)
        voh = np.maximum(voh, 0.0)
        valid = lz > 0

        # Smith height-correlated visibility V (includes 1/(4 NoV NoL));
        # sample weight = 4 V NoL VoH / NoH.  Matches the reference asset
        # to MC noise; the separable Smith-Schlick (k = alpha/2) does NOT.
        g_l = nol * np.sqrt(np.maximum(nov_g**2 * (1.0 - alpha2) + alpha2, 1e-18))
        g_v = nov_g * np.sqrt(np.maximum(nol**2 * (1.0 - alpha2) + alpha2, 1e-18))
        vis = 0.5 / np.maximum(g_l + g_v, 1e-9)
        g_vis = np.where(valid, 4.0 * vis * nol * voh / np.maximum(noh, 1e-9), 0.0)
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

    Returns [..., 2].  Rows (v) = roughness, cols (u) = NoV — nvdiffrast's
    convention for the reference's ``fg_uv = cat([NoV, roughness])`` sample
    (``dr.texture`` reads uv as (u=x=cols, v=y=rows), field.py:721-722).
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
    c00 = lut[v0, u0]
    c01 = lut[v0, u1]
    c10 = lut[v1, u0]
    c11 = lut[v1, u1]
    return ((1 - fv) * (1 - fu) * c00 + (1 - fv) * fu * c01
            + fv * (1 - fu) * c10 + fv * fu * c11)
