"""Fused chain-MLP Pallas TPU kernel.

Why this exists: profiling the stage-1 train step on TPU v5e showed it is
HBM-bandwidth-bound — ~480 distinct XLA fusions each stream [N,256]
activation tensors through HBM (~79 ms/step of fusions vs an ~35 ms flops
floor).  Every MLP layer boundary costs a full HBM round trip because the
next matmul reads from HBM.  This kernel runs an ENTIRE MLP chain per point
tile with all activations resident in VMEM: one HBM read of the input tile,
one HBM write of the output tile, weights resident across grid steps.

Replaces (speed only — semantics match the XLA modules, which remain the
source of truth and the CPU/test path):
  * ``fields/mlp.py`` Predictor heads (reference ``network/field.py:320-408``)
  * ``fields/nerf.py`` NeRF trunk (reference ``network/field.py:212-305``)
  * ``fields/sdf.py`` SDF forward (reference ``network/field.py:64-184``)

Layer model (per layer ``l``)::

    z_l = (h @ W_h[l] + x0 @ W_x[l]) * scale[l] + b[l]
    h   = act_l(z_l)

which covers plain layers (no ``W_x``), NeuS-style pre-concat skips
(``concat([h, x0]) / sqrt(2)`` -> split kernel rows, scale 1/sqrt(2)), and
nerf-pytorch post-concat skips (``concat([enc, h])`` -> split kernel rows,
scale 1).

Backward is a custom VJP: a second Pallas kernel recomputes the forward per
tile (activation stash stays in VMEM) and accumulates dW/db across the
sequential TPU grid in revisited output blocks; dx is per-tile.  Second-order
differentiation is NOT supported — the SDF main pass (eikonal double
backward) uses the XLA path or the dedicated value+jacobian kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    """Interpret-mode on non-TPU backends (CPU parity tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def pad_up(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def pad_last(x, m: int = LANE):
    """Zero-pad the last dim up to a multiple of ``m``."""
    d = x.shape[-1]
    p = pad_up(d, m) - d
    if p == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, p)]
    return jnp.pad(x, cfg)


class ChainSpec:
    """Static description of an MLP chain (hashable -> one kernel per spec).

    acts: per-layer activation in {'relu', 'softplus100', 'none'}.
    has_skip: per-layer bool — layer also consumes x0 through a second kernel.
    scales: per-layer scalar multiplier on the pre-bias sum (1/sqrt(2) for
        NeuS skips, else 1).
    dims: (in_dim, w1, ..., wL) — all padded to LANE multiples by the caller.
    """

    def __init__(self, dims, acts, has_skip, scales, compute_dtype="float32",
                 block_rows=512, block_rows_bwd=256):
        self.dims = tuple(int(d) for d in dims)
        self.acts = tuple(acts)
        self.has_skip = tuple(bool(s) for s in has_skip)
        self.scales = tuple(float(s) for s in scales)
        self.compute_dtype = compute_dtype
        self.block_rows = int(block_rows)
        self.block_rows_bwd = int(block_rows_bwd)
        self.n_layers = len(self.acts)
        assert len(self.dims) == self.n_layers + 1
        assert all(d % LANE == 0 for d in self.dims), self.dims

    def _key(self):
        return (self.dims, self.acts, self.has_skip, self.scales,
                self.compute_dtype, self.block_rows, self.block_rows_bwd)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, ChainSpec) and self._key() == other._key()


def _act(name, z):
    if name == "relu":
        return jax.nn.relu(z)
    if name == "softplus100":
        # softplus(beta=100): log(1+exp(100 z))/100, linear branch for large z
        # (jax.nn.softplus is already stable; keep the same formula)
        return jax.nn.softplus(z * 100.0) / 100.0
    return z


def _act_grad_from_a(name, a):
    """Derivative sigma'(z) recovered from the stored activation a=sigma(z)."""
    if name == "relu":
        return (a > 0).astype(jnp.float32)
    if name == "softplus100":
        # a = log(1+e^{100z})/100  =>  sigma'(z) = 1 - e^{-100 a}
        return 1.0 - jnp.exp(-100.0 * a)
    return jnp.ones_like(a, jnp.float32)


def _weights_per_layer(spec):
    """Number of weight arrays per layer (1 or 2) and total count."""
    counts = [2 if s else 1 for s in spec.has_skip]
    return counts, sum(counts)


def _forward_tile(spec, x, weights, biases, dtype):
    """Shared fwd math on one tile; returns (h_list, out).  h_list[l] is the
    activation AFTER layer l (h_list[-1] == out, pre-cast)."""
    h = x.astype(dtype)
    x0 = h
    h_list = []
    wi = 0
    for l in range(spec.n_layers):
        w_h = weights[wi].astype(dtype)
        wi += 1
        z = jnp.dot(h, w_h, preferred_element_type=jnp.float32)
        if spec.has_skip[l]:
            w_x = weights[wi].astype(dtype)
            wi += 1
            z = z + jnp.dot(x0, w_x, preferred_element_type=jnp.float32)
        if spec.scales[l] != 1.0:
            z = z * spec.scales[l]
        z = z + biases[l]
        h = _act(spec.acts[l], z).astype(dtype)
        h_list.append(h)
    return h_list, h


def _fwd_kernel(spec, n_rows, x_ref, *refs):
    nw = _weights_per_layer(spec)[1]
    w_refs = refs[:nw]
    b_refs = refs[nw:nw + spec.n_layers]
    out_ref = refs[nw + spec.n_layers]

    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
    valid = (i * spec.block_rows + rows) < n_rows
    x = jnp.where(valid, x_ref[:], 0.0)

    dtype = jnp.dtype(spec.compute_dtype)
    weights = [w[:] for w in w_refs]
    biases = [b[:] for b in b_refs]
    _, out = _forward_tile(spec, x, weights, biases, dtype)
    out_ref[:] = out.astype(jnp.float32)


def _make_bwd_kernel(spec, n_rows):
    counts, nw = _weights_per_layer(spec)
    n_l = spec.n_layers

    def kernel(x_ref, g_ref, *refs):
        w_refs = refs[:nw]
        b_refs = refs[nw:nw + n_l]
        dx_ref = refs[nw + n_l]
        dw_refs = refs[nw + n_l + 1:nw + n_l + 1 + nw]
        db_refs = refs[nw + n_l + 1 + nw:]

        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
        valid = (i * spec.block_rows_bwd + rows) < n_rows
        x = jnp.where(valid, x_ref[:], 0.0)
        g = jnp.where(valid, g_ref[:], 0.0).astype(jnp.float32)

        dtype = jnp.dtype(spec.compute_dtype)
        weights = [w[:] for w in w_refs]
        biases = [b[:] for b in b_refs]
        h_list, _ = _forward_tile(spec, x, weights, biases, dtype)
        x0 = x.astype(dtype)

        dx = jnp.zeros(x_ref.shape, jnp.float32)
        wi = nw
        for l in reversed(range(n_l)):
            a = h_list[l]
            gz = g * _act_grad_from_a(spec.acts[l], a.astype(jnp.float32))
            # z = (h@W_h + x0@W_x)*s + b: the scale touches the dot terms
            # only, so db uses the unscaled gz
            _accum(db_refs[l], jnp.sum(gz, axis=0, keepdims=True), i)
            if spec.scales[l] != 1.0:
                gz = gz * spec.scales[l]
            gz_c = gz.astype(dtype)
            h_prev = (h_list[l - 1] if l > 0 else x0)

            if spec.has_skip[l]:
                wi -= 1
                w_x = weights[wi]
                dw_x = jax.lax.dot_general(
                    x0, gz_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                _accum(dw_refs[wi], dw_x, i)
                dx = dx + jax.lax.dot_general(
                    gz_c, w_x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            wi -= 1
            w_h = weights[wi]
            dw_h = jax.lax.dot_general(
                h_prev, gz_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            _accum(dw_refs[wi], dw_h, i)

            gh = jax.lax.dot_general(
                gz_c, w_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if l > 0:
                g = gh
            else:
                dx = dx + gh
        dx_ref[:] = dx

    return kernel


def _accum(ref, val, pid):
    @pl.when(pid == 0)
    def _():
        ref[:] = val

    @pl.when(pid > 0)
    def _():
        ref[:] = ref[:] + val


def _flat_weight_shapes(spec):
    """Shapes of the flat weight list: per layer W_h [prev, w] and, if skip,
    W_x [in_dim, w]; then biases [1, w] per layer."""
    shapes = []
    prev = spec.dims[0]
    for l in range(spec.n_layers):
        w = spec.dims[l + 1]
        shapes.append((prev, w))
        if spec.has_skip[l]:
            shapes.append((spec.dims[0], w))
        prev = w
    return shapes


def _fwd_call(spec, x, flat):
    n, e = x.shape
    assert e == spec.dims[0], (e, spec.dims)
    t = spec.block_rows
    grid = (pl.cdiv(n, t),)
    nw = _weights_per_layer(spec)[1]
    w_shapes = _flat_weight_shapes(spec)

    in_specs = [pl.BlockSpec((t, e), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for s in w_shapes:
        in_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        in_specs.append(pl.BlockSpec((1, spec.dims[l + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_dim = spec.dims[-1]
    flops = 2 * n * sum(a * b for a, b in w_shapes)
    kernel = functools.partial(_fwd_kernel, spec, n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * n * (e + out_dim),
            transcendentals=n * 256 if "softplus100" in spec.acts else 0),
        interpret=_interpret(),
    )(x, *flat)


def _bwd_call(spec, x, g, flat):
    n, e = x.shape
    t = spec.block_rows_bwd
    grid = (pl.cdiv(n, t),)
    counts, nw = _weights_per_layer(spec)
    w_shapes = _flat_weight_shapes(spec)

    in_specs = [
        pl.BlockSpec((t, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, spec.dims[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for s in w_shapes:
        in_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        in_specs.append(pl.BlockSpec((1, spec.dims[l + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((n, e), jnp.float32)]
    out_specs = [pl.BlockSpec((t, e), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for s in w_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
        out_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        out_shapes.append(jax.ShapeDtypeStruct((1, spec.dims[l + 1]),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, spec.dims[l + 1]), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    flops = 6 * n * sum(a * b for a, b in w_shapes)
    kernel = _make_bwd_kernel(spec, n)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * n * (2 * e + spec.dims[-1]),
            transcendentals=n * 256 if "softplus100" in spec.acts else 0),
        interpret=_interpret(),
    )(x, g, *flat)
    dx = res[0]
    dws = res[1:1 + nw]
    dbs = res[1 + nw:]
    return dx, tuple(dws) + tuple(dbs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_chain_mlp(spec: ChainSpec, x, *flat):
    """Run the MLP chain described by ``spec`` over ``x`` [N, in_dim].

    ``flat``: weight arrays per layer (W_h and, for skip layers, W_x), then
    biases as [1, w] rows.  Returns float32 [N, out_dim].
    """
    return _fwd_call(spec, x, flat)


def _fused_fwd(spec, x, *flat):
    return _fwd_call(spec, x, flat), (x, flat)


def _fused_bwd(spec, res, g):
    x, flat = res
    dx, dflat = _bwd_call(spec, x, g, flat)
    return (dx,) + tuple(dflat)


fused_chain_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Reference (XLA) evaluation of the same chain — used for parity tests and as
# the CPU fallback path.
# ---------------------------------------------------------------------------

def chain_mlp_reference(spec: ChainSpec, x, *flat):
    nw = _weights_per_layer(spec)[1]
    weights = flat[:nw]
    biases = flat[nw:]
    dtype = jnp.dtype(spec.compute_dtype)
    h = x.astype(dtype)
    x0 = h
    wi = 0
    for l in range(spec.n_layers):
        z = jnp.dot(h, weights[wi].astype(dtype),
                    preferred_element_type=jnp.float32)
        wi += 1
        if spec.has_skip[l]:
            z = z + jnp.dot(x0, weights[wi].astype(dtype),
                            preferred_element_type=jnp.float32)
            wi += 1
        if spec.scales[l] != 1.0:
            z = z * spec.scales[l]
        z = z + biases[l]
        h = _act(spec.acts[l], z).astype(dtype)
    return h.astype(jnp.float32)


def use_fused_mlp() -> bool:
    """Opt-in (env NUNERF_FUSED_MLP=1 or cfg ``fused_mlp``).  Currently the
    measured v5e step time is WORSE fused (258 ms vs 130 ms — the bwd
    dW-accumulation pattern needs work), so the default stays off until the
    kernel beats XLA."""
    v = os.environ.get("NUNERF_FUSED_MLP")
    return v is not None and v not in ("0", "false", "")
