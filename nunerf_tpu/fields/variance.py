"""NeuS single-parameter deviation (inv_s) network.

Reference: ``network/field.py:191-208`` — one learnable scalar with
``exp(10 v)`` (default), ``linear`` or ``square`` activation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SingleVarianceNetwork(nn.Module):
    init_val: float = 0.3
    activation: str = "exp"

    @nn.compact
    def __call__(self, x):
        variance = self.param(
            "variance", lambda rng: jnp.asarray(self.init_val, jnp.float32))
        if self.activation == "exp":
            val = jnp.exp(variance * 10.0)
        elif self.activation == "linear":
            val = variance * 10.0
        elif self.activation == "square":
            val = (variance * 10.0) ** 2
        else:
            raise NotImplementedError(self.activation)
        return jnp.ones((*x.shape[:-1], 1), x.dtype) * val
