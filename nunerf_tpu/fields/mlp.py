"""MLP building blocks: weight-normalized dense layers and predictor heads.

Mirrors the reference's ``nn.utils.weight_norm(nn.Linear(...))`` layers and
``make_predictor``/``make_predictor1`` heads (``network/field.py:320-408``),
re-expressed as Flax modules.

Weight norm parameterization: ``W = g * V / ||V||`` with the norm taken per
output unit (PyTorch's default ``dim=0`` on a ``[out, in]`` weight; here the
kernel is ``[in, out]`` so the norm runs over axis 0).  ``g`` is initialized to
``||V_init||`` so the initial function matches plain initialization — exactly
what ``weight_norm`` applied after init does in the reference.

TPU note: all hidden widths are 256 (two MXU lanes wide); matmuls accumulate
in float32 via ``preferred_element_type`` when inputs are bf16.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel_init(rng, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default weight init (kaiming uniform, a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)).  shape = [in, out]."""
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


class WNDense(nn.Module):
    """Weight-normalized dense layer.

    ``kernel_init`` samples V (shape [in, out]); g starts at per-column
    ``||V||`` so initial output equals a plain Dense with that kernel.

    ``dtype``: compute dtype for the matmul (params stay float32; bf16 here
    engages the MXU's native rate with float32 accumulation via
    ``preferred_element_type`` — standard mixed precision).
    """

    features: int
    kernel_init: Callable = torch_linear_kernel_init
    bias_init: Optional[Callable] = None
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        in_features = x.shape[-1]
        v = self.param("v", self.kernel_init, (in_features, self.features))
        g = self.param("g", lambda rng: jnp.linalg.norm(v, axis=0))
        bias_init = self.bias_init or torch_linear_bias_init(in_features)
        norm = jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12)
        kernel = v * (g / norm)
        b = self.param("b", bias_init, (self.features,)) if self.use_bias else None
        if return_weights:
            # fused-kernel path: hand back the normalized weights instead of
            # applying the layer (param tree stays identical)
            return kernel, b
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b
        return y.astype(self.dtype) if self.dtype is not None else y


class Dense(nn.Module):
    """Plain dense with PyTorch-default init (for the NeRF background MLP)."""

    features: int
    kernel_init: Callable = torch_linear_kernel_init
    bias_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features))
        bias_init = self.bias_init or torch_linear_bias_init(in_features)
        b = self.param("bias", bias_init, (self.features,))
        if return_weights:
            return kernel, b
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32) + b
        return y.astype(self.dtype) if self.dtype is not None else y


def exp_activation(x, max_light: float = 5.0):
    """ExpActivation (field.py:312-318): exp(clip(x, max=max_light))."""
    return jnp.exp(jnp.minimum(x, max_light))


_ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "none": lambda x: x,
}


class Predictor(nn.Module):
    """``make_predictor`` head (field.py:371-408): N hidden 256-wide WN layers
    with ReLU, final WN layer + activation.  ``n_hidden=3`` matches
    ``make_predictor``; ``n_hidden=6`` matches ``make_predictor1``.

    ``final_bias`` (if set) overrides the last layer's bias constant — the
    reference does this post-hoc with ``nn.init.constant_`` (e.g. outer_light
    bias = log(0.5), field.py:598).
    """

    out_dim: int
    n_hidden: int = 3
    activation: str = "sigmoid"
    exp_max: float = 0.0
    weight_norm: bool = True
    final_bias: Optional[float] = None
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # TPU fused-chain-MLP kernel (ops/fused_mlp.py)

    @nn.compact
    def __call__(self, x):
        layer = WNDense if self.weight_norm else Dense
        final_bias_init = None
        if self.final_bias is not None:
            fb = float(self.final_bias)
            final_bias_init = lambda rng, shape, dtype=jnp.float32: jnp.full(shape, fb, dtype)

        if self.fused:
            wb = []
            h_dim = x.shape[-1]
            for i in range(self.n_hidden):
                dummy = jnp.zeros((1, h_dim), x.dtype) if i else x
                wb.append(layer(256, name=f"hidden_{i}",
                                dtype=self.dtype)(dummy, return_weights=True))
                h_dim = 256
            wb.append(layer(self.out_dim, name="out", bias_init=final_bias_init,
                            dtype=self.dtype)(jnp.zeros((1, 256), x.dtype),
                                              return_weights=True))
            x = _fused_predictor(x, wb, self.dtype)
        else:
            for i in range(self.n_hidden):
                x = layer(256, name=f"hidden_{i}", dtype=self.dtype)(x)
                x = jax.nn.relu(x)
            x = layer(self.out_dim, name="out", bias_init=final_bias_init,
                      dtype=self.dtype)(x)
        x = x.astype(jnp.float32)  # head outputs stay f32 for the physics
        if self.activation == "exp":
            return exp_activation(x, self.exp_max)
        return _ACTS[self.activation](x)


def _fused_predictor(x, wb, dtype):
    """Run a predictor layer stack through the fused chain kernel.

    ``wb``: [(W, b)] per layer, hidden layers relu, final linear.  Logical
    (unpadded) shapes go straight to the kernel — Mosaic masks unaligned
    lane dims in VMEM, so no HBM-visible pad/slice copies.
    """
    from nunerf_tpu.ops.fused_mlp import ChainSpec, fused_chain_mlp

    lead_shape = x.shape[:-1]
    d_in = x.shape[-1]
    x2 = x.reshape(-1, d_in).astype(jnp.float32)
    n_l = len(wb)
    out_dim = wb[-1][0].shape[1]

    dims = [d_in] + [w.shape[1] for w, _ in wb]
    flat_w = [w for w, _ in wb]
    flat_b = [b[None, :] for _, b in wb]
    spec = ChainSpec(
        tuple(dims), ("relu",) * (n_l - 1) + ("none",), (False,) * n_l,
        (1.0,) * n_l,
        compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32")
    y = fused_chain_mlp(spec, x2, *flat_w, *flat_b)
    return y.reshape(*lead_shape, out_dim)


class WNMLPStack(nn.Module):
    """A fixed stack of WN layers with per-layer ReLU flags — used for the
    small field MLPs (InfOut/IoR/Thickness, field.py:1020-1087) whose layer
    patterns are irregular (some layers have no interleaved ReLU).
    """

    features: Sequence[int]
    relu_after: Sequence[bool]
    final_act: str = "none"

    @nn.compact
    def __call__(self, x):
        for i, (f, r) in enumerate(zip(self.features, self.relu_after)):
            x = WNDense(f, name=f"layer_{i}")(x)
            if r:
                x = jax.nn.relu(x)
        return _ACTS[self.final_act](x)
