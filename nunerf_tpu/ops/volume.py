"""Volume rendering composition: alpha -> transmittance-weighted compositing.

Reference math: ``weights = alpha * cumprod(cat([1, 1-alpha+1e-7]))[:-1]``
(renderer.py:790-792).  The exclusive cumulative product is an associative
scan; XLA lowers ``cumprod`` to a log-depth parallel scan on TPU, and the whole
chain (alpha -> weights -> weighted sum) fuses into the surrounding kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """cumprod shifted right by one, with leading 1 (transmittance)."""
    ones_shape = list(x.shape)
    ones_shape[axis] = 1
    ones = jnp.ones(ones_shape, dtype=x.dtype)
    shifted = jnp.concatenate([ones, x], axis=axis)
    full = jnp.cumprod(shifted, axis=axis)
    return jax.lax.slice_in_dim(full, 0, x.shape[axis], axis=axis)


def alpha_to_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """NeuS/NeRF compositing weights from per-sample alphas [..., S]."""
    return alpha * exclusive_cumprod(1.0 - alpha + 1e-7)


def composite(weights: jnp.ndarray, values: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Weighted sum of per-sample values [..., S, C] -> [..., C]."""
    return jnp.sum(weights[..., None] * values, axis=axis)
