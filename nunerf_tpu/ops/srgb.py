"""Piecewise sRGB <-> linear conversions (reference ``utils/raw_utils.py:5-35``).

Used throughout shading composition ("gamma correction" of rendered colors).
Works on both jnp and np arrays (jnp ops dispatch on numpy inputs too).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def linear_to_srgb(linear):
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(linear, _EPS) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb):
    linear0 = 25.0 / 323.0 * srgb
    linear1 = jnp.maximum((200.0 * srgb + 11.0) / 211.0, _EPS) ** (12.0 / 5.0)
    return jnp.where(srgb <= 0.04045, linear0, linear1)
