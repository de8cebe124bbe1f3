"""NeRF positional (frequency) encoding.

Matches the reference encoder semantics (reference ``network/field.py:14-61``):
``include_input=True``, log-spaced frequencies ``2^0 .. 2^(multires-1)``, and
per-frequency ``[sin, cos]`` pairs, concatenated as
``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` on the last axis.

TPU note: implemented as one broadcasted multiply + sin/cos over a
``(..., n_freqs, d)`` tensor so XLA fuses it into the consumer matmul's
producer fusion; no Python-loop of tiny ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def posenc_dim(multires: int, d: int = 3) -> int:
    """Output dimension of :func:`posenc`."""
    return d + 2 * multires * d


def posenc(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Frequency-encode ``x`` (shape ``[..., d]``) -> ``[..., d*(1+2*multires)]``.

    Ordering matches the reference: identity first, then for each frequency
    ``f`` (ascending) the block ``[sin(f*x), cos(f*x)]`` (each of width ``d``).
    """
    if multires <= 0:
        return x
    freqs = jnp.asarray(2.0 ** np.arange(multires), dtype=x.dtype)  # [m]
    xb = x[..., None, :] * freqs[:, None]  # [..., m, d]
    # [..., m, 2, d] with sin before cos, then flatten to [..., m*2*d]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
