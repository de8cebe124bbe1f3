"""NeuS SDF network with geometric (sphere) initialization.

Reference: ``network/field.py:64-184``.  8x256 weight-normalized MLP, skip
connection at the middle layer (concat input / sqrt(2)), softplus(beta=100)
activations, output ``[sdf, feature_256]``.  Geometric init biases the initial
SDF toward a sphere of radius ``bias``.

Gradients (surface normals) are computed with ``jax.grad`` outside this module
— forward-over-reverse in JAX replaces the reference's double-backward
``torch.autograd.grad(create_graph=True)``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.fields.mlp import WNDense
from nunerf_tpu.ops.embedder import posenc, posenc_dim


def _normal_init(mean: float, std: float):
    def init(rng, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(rng, shape, dtype)
    return init


def _const_init(val: float):
    def init(rng, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)
    return init


class SDFNetwork(nn.Module):
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Sequence[int] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    inside_outside: bool = False

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        d_in = x.shape[-1]
        in_dim = posenc_dim(self.multires, d_in) if self.multires > 0 else d_in
        dims = [in_dim] + [self.d_hidden] * self.n_layers + [self.d_out]
        num_layers = len(dims)

        inputs = x * self.scale
        if self.multires > 0:
            inputs = posenc(inputs, self.multires)

        wb, h_dim = [], in_dim
        h = inputs
        for l in range(num_layers - 1):
            if l + 1 in self.skip_in:
                out_dim = dims[l + 1] - dims[0]
            else:
                out_dim = dims[l + 1]

            if self.geometric_init:
                if l == num_layers - 2:
                    mean = np.sqrt(np.pi) / np.sqrt(dims[l])
                    if self.inside_outside:
                        k_init = _normal_init(-mean, 1e-4)
                        b_init = _const_init(self.bias)
                    else:
                        k_init = _normal_init(mean, 1e-4)
                        b_init = _const_init(-self.bias)
                elif self.multires > 0 and l == 0:
                    std = np.sqrt(2) / np.sqrt(out_dim)

                    def k_init(rng, shape, dtype=jnp.float32, _std=std):
                        # first 3 input rows ~ N(0, std); the posenc rows zero
                        w = jnp.zeros(shape, dtype)
                        return w.at[:3, :].set(
                            _std * jax.random.normal(rng, (3, shape[1]), dtype))
                    b_init = _const_init(0.0)
                elif self.multires > 0 and l in self.skip_in:
                    std = np.sqrt(2) / np.sqrt(out_dim)
                    n_zero = dims[0] - 3

                    def k_init(rng, shape, dtype=jnp.float32, _std=std, _nz=n_zero):
                        w = _std * jax.random.normal(rng, shape, dtype)
                        # zero the tail posenc rows of the skip input
                        return w.at[shape[0] - _nz:, :].set(0.0)
                    b_init = _const_init(0.0)
                else:
                    k_init = _normal_init(0.0, np.sqrt(2) / np.sqrt(out_dim))
                    b_init = _const_init(0.0)
            else:
                k_init, b_init = None, None

            kwargs = {}
            if k_init is not None:
                kwargs = dict(kernel_init=k_init, bias_init=b_init)
            if return_weights:
                cur_in = h_dim + (dims[0] if l in self.skip_in else 0)
                wb.append(WNDense(out_dim, name=f"lin{l}", **kwargs)(
                    jnp.zeros((1, cur_in)), return_weights=True))
                h_dim = out_dim
                continue
            if l in self.skip_in:
                h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
            h = WNDense(out_dim, name=f"lin{l}", **kwargs)(h)
            if l < num_layers - 2:
                # softplus with beta=100
                h = jax.nn.softplus(h * 100.0) / 100.0
        if return_weights:
            return wb
        return h

    def sdf(self, x):
        return self(x)[..., :1]


def fused_sdf_apply(module: SDFNetwork, params, x):
    """SDF forward through the fused chain kernel (ops/fused_mlp.py).

    First-order differentiable only (custom VJP) — callers that need the
    eikonal double backward use ``module.apply`` directly; this path serves
    the no-grad sampling sweeps, the occlusion march, and grid extraction,
    which together dominate SDF evaluations per train step.

    The NeuS skip layer (width ``d_hidden - in_dim`` pre-concat) is padded to
    lane multiples; padded activations are annihilated by zero weight rows.
    """
    from nunerf_tpu.ops.fused_mlp import (ChainSpec, fused_chain_mlp, pad_up,
                                          pad_last)

    wb = module.apply(params, jnp.zeros((1, x.shape[-1])), return_weights=True)
    in_dim = posenc_dim(module.multires, x.shape[-1]) \
        if module.multires > 0 else x.shape[-1]

    inputs = x.reshape(-1, x.shape[-1]) * module.scale
    if module.multires > 0:
        inputs = posenc(inputs, module.multires)
    x2 = pad_last(inputs.astype(jnp.float32))
    e_pad = x2.shape[-1]

    n_l = len(wb)
    dims, acts, has_skip, scales = [e_pad], [], [], []
    flat_w, flat_b = [], []
    prev_pad, prev_real = e_pad, in_dim
    for l, (w, b) in enumerate(wb):
        real_out = w.shape[1]
        out_pad = pad_up(real_out)
        if l in module.skip_in:
            # input was concat([h(prev_real), inputs(in_dim)]) / sqrt(2)
            w_h, w_x = w[:prev_real], w[prev_real:]
            flat_w.append(jnp.pad(w_h, ((0, prev_pad - prev_real),
                                        (0, out_pad - real_out))))
            flat_w.append(jnp.pad(w_x, ((0, e_pad - in_dim),
                                        (0, out_pad - real_out))))
            has_skip.append(True)
            scales.append(1.0 / float(np.sqrt(2)))
        else:
            flat_w.append(jnp.pad(w, ((0, prev_pad - prev_real),
                                      (0, out_pad - real_out))))
            has_skip.append(False)
            scales.append(1.0)
        flat_b.append(jnp.pad(b, (0, out_pad - real_out))[None, :])
        dims.append(out_pad)
        acts.append("softplus100" if l < n_l - 1 else "none")
        prev_pad, prev_real = out_pad, real_out

    spec = ChainSpec(tuple(dims), tuple(acts), tuple(has_skip), tuple(scales))
    y = fused_chain_mlp(spec, x2, *flat_w, *flat_b)[:, :module.d_out]
    return y.reshape(*x.shape[:-1], module.d_out)


def sdf_value_feature_grad(apply_fn, params, points):
    """Evaluate (sdf, feature, grad_sdf) at ``points`` [N,3].

    Uses per-example reverse-mode gradients under vmap; higher-order
    (eikonal-through-training) differentiation composes cleanly.
    """
    def single(p):
        out = apply_fn(params, p[None])[0]
        return out[0], out[1:]

    def sdf_only(p):
        return apply_fn(params, p[None])[0, 0]

    grads = jax.vmap(jax.grad(sdf_only))(points)
    out = apply_fn(params, points)
    return out[..., 0], out[..., 1:], grads
