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

from typing import Optional, Sequence

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
    # Compute dtype for the trunk matmuls (params and the final layer's
    # output stay float32; accumulation is float32 via
    # ``preferred_element_type``).  bf16 runs the MXU at native rate on both
    # the forward and the cotangent matmuls — opt-in via cfg
    # ``sdf_mixed_precision`` because the SDF zero-crossing drives geometry.
    dtype: Optional[jnp.dtype] = None

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
                h = jnp.concatenate([h, inputs.astype(h.dtype)],
                                    axis=-1) / np.sqrt(2)
            # final layer keeps its f32 accumulation (the SDF zero-crossing
            # and the feature vector leave the trunk in full precision)
            lt = None if l == num_layers - 2 else self.dtype
            h = WNDense(out_dim, name=f"lin{l}", dtype=lt, **kwargs)(h)
            if l < num_layers - 2:
                # softplus with beta=100
                h = jax.nn.softplus(h * 100.0) / 100.0
        if return_weights:
            return wb
        return h

    def sdf(self, x):
        return self(x)[..., :1]


def _sdf_chain(module: SDFNetwork, params, d_in: int):
    """(spec, flat) of the SDF chain for the fused kernels.  The NeuS skip
    layer's odd widths go to the kernel unpadded (Mosaic masks in VMEM).

    Matmul operands: bf16 on TPU — XLA's DEFAULT precision for f32 dots on
    TPU is a single bf16 pass (measured: param-grad rel err ~5e-3 vs the
    f32-emulating 'highest'), so the kernel matches the numerics of the XLA
    path it replaces while running the MXU at native rate.  f32 off-TPU so
    the interpret-mode parity tests stay strict."""
    from nunerf_tpu.ops.fused_mlp import ChainSpec

    wb = module.apply(params, jnp.zeros((1, d_in)), return_weights=True)
    in_dim = posenc_dim(module.multires, d_in) if module.multires > 0 else d_in

    n_l = len(wb)
    dims, acts, has_skip, scales = [in_dim], [], [], []
    flat_w, flat_b = [], []
    prev_real = in_dim
    for l, (w, b) in enumerate(wb):
        if l in module.skip_in:
            # input was concat([h(prev_real), inputs(in_dim)]) / sqrt(2)
            w_h, w_x = w[:prev_real], w[prev_real:]
            flat_w.append(w_h)
            flat_w.append(w_x)
            has_skip.append(True)
            scales.append(1.0 / float(np.sqrt(2)))
        else:
            flat_w.append(w)
            has_skip.append(False)
            scales.append(1.0)
        flat_b.append(b[None, :])
        dims.append(w.shape[1])
        acts.append("softplus100" if l < n_l - 1 else "none")
        prev_real = w.shape[1]

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    spec = ChainSpec(tuple(dims), tuple(acts), tuple(has_skip), tuple(scales),
                     compute_dtype="bfloat16" if on_tpu else "float32")
    return spec, flat_w + flat_b


def _sdf_embed(module: SDFNetwork, x2):
    inputs = x2 * module.scale
    if module.multires > 0:
        inputs = posenc(inputs, module.multires)
    return inputs.astype(jnp.float32)


def fused_sdf_apply(module: SDFNetwork, params, x, value_only: bool = False):
    """SDF forward through the fused chain kernel (ops/fused_mlp.py).

    First-order differentiable only (custom VJP) — serves the no-grad
    sampling sweeps, the occlusion march, and grid extraction; the main pass
    uses ``fused_sdf_all`` (value+jacobian kernel).

    ``value_only`` slices the final layer to the sdf column BEFORE the
    kernel, so the kernel writes [N,1] instead of [N,257] — 257x less output
    traffic, and mandatory at mesh-extraction scale (a res-512 z-slab is
    33.5M points; a 257-wide f32 output there is 34 GB).
    """
    from nunerf_tpu.ops.fused_mlp import ChainSpec, fused_chain_mlp

    spec, flat = _sdf_chain(module, params, x.shape[-1])
    if value_only:
        nw = sum(2 if s else 1 for s in spec.has_skip)
        # flat[nw-1] must be the last layer's ONLY weight: a skip on the
        # final layer would make it the W_x half and mis-slice the chain
        assert not spec.has_skip[-1], "value_only requires a skip-free final layer"
        flat = list(flat)
        flat[nw - 1] = flat[nw - 1][:, :1]   # last W_h -> sdf column
        flat[-1] = flat[-1][:, :1]           # last bias
        spec = ChainSpec(spec.dims[:-1] + (1,), spec.acts, spec.has_skip,
                         spec.scales, compute_dtype=spec.compute_dtype)
    x2 = _sdf_embed(module, x.reshape(-1, x.shape[-1]))
    y = fused_chain_mlp(spec, x2, *flat)
    return y.reshape(*x.shape[:-1], 1 if value_only else module.d_out)


def fused_sdf_all(module: SDFNetwork, params, x):
    """(sdf, feats, grad_x) via the fused value+jacobian kernel.

    The kernel emits d sdf / d embedding; the positional-encoding pullback
    (elementwise) maps it to xyz space.  Training losses of BOTH outputs
    (color/eikonal through grad_x) differentiate correctly through the
    hand-derived VJP kernel — this replaces ``sdf_value_feature_grad``'s
    vmap(jax.grad) + XLA double backward on the hot path.
    """
    from nunerf_tpu.ops.fused_mlp import chain_mlp_with_grad0

    spec, flat = _sdf_chain(module, params, x.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    inputs, emb_pull = jax.vjp(lambda xx: _sdf_embed(module, xx), x2)
    y, j_emb = chain_mlp_with_grad0(spec, inputs, *flat)
    grad_x = emb_pull(j_emb)[0]
    lead = x.shape[:-1]
    return (y[..., 0].reshape(lead), y[..., 1:].reshape(*lead, -1),
            grad_x.reshape(*lead, x.shape[-1]))


def sdf_value_feature_grad(apply_fn, params, points):
    """Evaluate (sdf, feature, grad_sdf) at ``points`` [N,3].

    Batched reverse-mode via ``jax.vjp`` with a cotangent selecting the sdf
    channel: each row of the output depends only on its own input point, so
    the full-batch pullback IS the per-example gradient — and, unlike
    vmap(jax.grad), it shares the forward pass with the value/feature
    outputs instead of recomputing it.  Training then differentiates
    reverse-over-reverse, like the reference's double backward
    (field.py:158-170).  Measured fwd+bwd at bench scale (164k points,
    8x256 chain, per-iteration-varying inputs inside a scan): batched vjp
    34.5 ms < vmap(grad) 43.8 ms < fused Pallas value+jacobian kernel
    73.4 ms < jvp-tangent jacobian 96.3 ms; beware loop-invariant hoisting
    when re-benchmarking.
    """
    out, pull = jax.vjp(lambda p: apply_fn(params, p), points)
    ct = jnp.zeros_like(out).at[..., 0].set(1.0)
    grads, = pull(ct)
    return out[..., 0], out[..., 1:], grads
