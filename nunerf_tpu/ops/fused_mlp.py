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

# The chain kernels keep whole activation stashes (h/d/q lists) resident in
# VMEM per tile; the default scoped-vmem limit (16 MiB) rejects them even
# though v5e has 128 MiB of VMEM.  Raise the per-kernel cap instead of the
# global XLA flag.
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


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
    dims: (in_dim, w1, ..., wL) — LOGICAL dims; Mosaic masks unaligned
        lane dims inside the kernel, so callers pass weights unpadded (no
        HBM-visible pad/slice copies).
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
        # hidden activations carry the compute dtype; the final layer's
        # output stays f32 (mirrors the XLA modules' mixed-precision policy)
        lt = jnp.float32 if l == spec.n_layers - 1 else dtype
        h = _act(spec.acts[l], z).astype(lt)
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


def _bwd_mode() -> str:
    """dW strategy for the chain-MLP backward kernel.

    ``accum``: every grid step read-modify-writes one shared dW block —
    minimal HBM traffic but serializes the tile pipeline on the revisited
    block (the measured round-3 loss vs XLA).
    ``partial`` (default): each grid step writes its OWN dW slot (leading
    grid dim); XLA reduces over slots afterwards.  Trades ~G x |W| of HBM
    writes (~0.5 ms at 131k pts / 512-row tiles on v5e) for an unstalled
    pipeline — the round-4 design from docs/perf_notes.md."""
    return os.environ.get("NUNERF_FUSED_BWD", "partial")


def _make_bwd_kernel(spec, n_rows, partial=False):
    counts, nw = _weights_per_layer(spec)
    n_l = spec.n_layers

    def _emit(ref, val, pid):
        if partial:
            ref[:] = val[None]
        else:
            _accum(ref, val, pid)

    def kernel(x_ref, g_ref, *refs):
        w_refs = refs[:nw]
        wt_refs = refs[nw:2 * nw]
        b_refs = refs[2 * nw:2 * nw + n_l]
        dx_ref = refs[2 * nw + n_l]
        dw_refs = refs[2 * nw + n_l + 1:2 * nw + n_l + 1 + nw]
        db_refs = refs[2 * nw + n_l + 1 + nw:]

        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
        valid = (i * spec.block_rows_bwd + rows) < n_rows
        x = jnp.where(valid, x_ref[:], 0.0)
        g = jnp.where(valid, g_ref[:], 0.0).astype(jnp.float32)

        dtype = jnp.dtype(spec.compute_dtype)
        weights = [w[:] for w in w_refs]
        weights_t = [w[:] for w in wt_refs]
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
            _emit(db_refs[l], jnp.sum(gz, axis=0, keepdims=True), i)
            if spec.scales[l] != 1.0:
                gz = gz * spec.scales[l]
            gz_c = gz.astype(dtype)
            h_prev = (h_list[l - 1] if l > 0 else x0)

            # gz @ W^T uses the precomputed transposes: a contracting-dim-1
            # dot_general lowers to a per-tile transpose on Mosaic and is
            # ~10x slower than a plain dot (measured v5e); A^T@B (dW) is fine.
            if spec.has_skip[l]:
                wi -= 1
                dw_x = jax.lax.dot_general(
                    x0, gz_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                _emit(dw_refs[wi], dw_x, i)
                dx = dx + jnp.dot(gz_c, weights_t[wi],
                                  preferred_element_type=jnp.float32)
            wi -= 1
            dw_h = jax.lax.dot_general(
                h_prev, gz_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            _emit(dw_refs[wi], dw_h, i)

            gh = jnp.dot(gz_c, weights_t[wi],
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
        compiler_params=_compiler_params(),
    )(x, *flat)


def _bwd_call(spec, x, g, flat):
    n, e = x.shape
    t = spec.block_rows_bwd
    grid = (pl.cdiv(n, t),)
    counts, nw = _weights_per_layer(spec)
    w_shapes = _flat_weight_shapes(spec)
    ws, bs = flat[:nw], flat[nw:]
    wts = tuple(w.T for w in ws)  # XLA transposes once; tiny vs the kernel

    in_specs = [
        pl.BlockSpec((t, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, spec.dims[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for s in w_shapes:
        in_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for s in w_shapes:
        in_specs.append(pl.BlockSpec((s[1], s[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        in_specs.append(pl.BlockSpec((1, spec.dims[l + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    partial = _bwd_mode() == "partial"
    n_tiles = grid[0]

    out_shapes = [jax.ShapeDtypeStruct((n, e), jnp.float32)]
    out_specs = [pl.BlockSpec((t, e), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for s in w_shapes:
        if partial:
            out_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + s,
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((1,) + s, lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
        else:
            out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
            out_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        bshape = (1, spec.dims[l + 1])
        if partial:
            out_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + bshape,
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((1,) + bshape,
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
        else:
            out_shapes.append(jax.ShapeDtypeStruct(bshape, jnp.float32))
            out_specs.append(pl.BlockSpec(bshape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))

    flops = 6 * n * sum(a * b for a, b in w_shapes)
    kernel = _make_bwd_kernel(spec, n, partial)
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
        compiler_params=_compiler_params(),
    )(x, g, *ws, *wts, *bs)
    dx = res[0]
    dws = res[1:1 + nw]
    dbs = res[1 + nw:]
    if partial:
        dws = [jnp.sum(d, axis=0) for d in dws]
        dbs = [jnp.sum(d, axis=0) for d in dbs]
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
    """Opt-in (env NUNERF_FUSED_MLP=1 or cfg ``fused_mlp``).

    Honest v5e measurements (varying inputs in a scan, value fetched):
    * value-only SDF sweep, 164k pts: fused 2.36 ms vs XLA 3.47 ms — the
      kernel WINS 32%: XLA sits at the HBM roofline and the kernel removes
      7 of 8 per-layer activation round trips.
    * 4-layer predictor head fwd+bwd, 131k pts, bf16: fused 3.48 ms vs XLA
      2.22 ms — XLA WINS; its backward is already near roofline and the
      kernel's in-VMEM dW accumulation stalls the tile pipeline.
    Training is dominated by fwd+bwd paths, so the default stays off; the
    forward-only win is available through this gate for inference/eval-heavy
    workloads."""
    v = os.environ.get("NUNERF_FUSED_MLP")
    return v is not None and v not in ("0", "false", "")


def use_fused_sdf_value() -> bool:
    """Gate for the fused chain forward on the VALUE-ONLY SDF path (sampling
    upsweeps, occlusion march, grid extraction — all first-order/no-grad).
    Default ON on TPU (measured 2.36 vs 3.47 ms per 164k-pt sweep, see
    ``use_fused_mlp``), overridable via NUNERF_FUSED_SDF_VALUE=0/1; off
    elsewhere (interpret-mode Pallas is slow on CPU)."""
    v = os.environ.get("NUNERF_FUSED_SDF_VALUE")
    if v is not None:
        return v not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_fused_sdf() -> bool:
    """Gate for the fused SDF value+jacobian kernel
    (``chain_mlp_with_grad0``) — opt-in via env NUNERF_FUSED_SDF=1 or cfg
    ``fused_sdf``.  Honest v5e measurements (varying inputs in a scan,
    164k points, fwd+bwd through a loss on value+feature+grad):
    batched-vjp XLA 34.5 ms < fused kernel 87.7 ms.  The jacobian design
    keeps h/d/q stashes live across both sweeps and Mosaic's register
    allocator spills >130 MB at block_rows=1024 (OOMs scoped vmem), so the
    kernel loses despite precomputed weight transposes and bf16 operands.
    Default off until the stash pressure is restructured."""
    v = os.environ.get("NUNERF_FUSED_SDF")
    return v is not None and v not in ("0", "false", "")


# ---------------------------------------------------------------------------
# Chain MLP with input-gradient of output channel 0 (the SDF main path).
#
# Computes y = chain(x) AND j = d y[...,0] / d x in one kernel (forward +
# in-VMEM reverse sweep).  Training differentiates losses of BOTH y and j
# wrt (x, W, b); that second-order structure is provided by a hand-derived
# VJP kernel (reverse over the fwd+reverse program), so no nested autodiff
# through Pallas is needed.  Replaces fields/sdf.py sdf_value_feature_grad's
# vmap(jax.grad) + XLA double backward (reference field.py:158-170).
# ---------------------------------------------------------------------------

def _act_grad2_from_d(name, d):
    """sigma''(z) from sigma'(z).  softplus100: d' = 100 d (1-d); relu/id: 0."""
    if name == "softplus100":
        return 100.0 * d * (1.0 - d)
    return jnp.zeros_like(d)


def _jac_sweeps(spec, x, weights, weights_t, biases):
    """Forward + J-pass on one tile.  Returns (h_list, d_list, q_list,
    starts, y, j) where q_list[l] is the cotangent at h_l of y[...,0]
    (l = 0..L-2), j = d y0/dx.

    All B@W^T products use the precomputed ``weights_t`` (a contracting-dim-1
    dot_general forces a per-tile transpose in Mosaic, ~10x slower than a
    plain dot on v5e — same finding as the plain bwd kernel); matmul operands
    are cast to ``spec.compute_dtype`` with f32 accumulation."""
    assert spec.acts[-1] == "none", "jac kernel expects a linear final layer"
    n_l = spec.n_layers
    dtype = jnp.dtype(spec.compute_dtype)
    h_list, _ = _forward_tile(spec, x, weights, biases, dtype)
    d_list = [_act_grad_from_a(spec.acts[l], h_list[l].astype(jnp.float32))
              for l in range(n_l)]

    # weight index bookkeeping: start index of each layer's weights
    starts = []
    wi = 0
    for l in range(n_l):
        starts.append(wi)
        wi += 2 if spec.has_skip[l] else 1

    # J-pass (reverse for channel 0): q_{l-1} = s_l (p_l @ Wh_l^T),
    # p_l = q_l * d_l, seeded with p_L = e0 (last act linear).
    j = jnp.zeros(x.shape, jnp.float32)
    l = n_l - 1
    w_h = weights[starts[l]]
    q = spec.scales[l] * jnp.broadcast_to(
        w_h[:, 0][None, :].astype(jnp.float32), (x.shape[0], w_h.shape[0]))
    if spec.has_skip[l]:
        w_x = weights[starts[l] + 1]
        j = j + spec.scales[l] * jnp.broadcast_to(
            w_x[:, 0][None, :].astype(jnp.float32), x.shape)
    q_list = [None] * n_l
    q_list[l - 1] = q
    for l in reversed(range(n_l - 1)):
        p = (q_list[l] * d_list[l]).astype(dtype)
        nxt = jnp.dot(p, weights_t[starts[l]].astype(dtype),
                      preferred_element_type=jnp.float32)
        nxt = nxt * spec.scales[l]
        if spec.has_skip[l]:
            j = j + spec.scales[l] * jnp.dot(
                p, weights_t[starts[l] + 1].astype(dtype),
                preferred_element_type=jnp.float32)
        if l == 0:
            j = j + nxt
        else:
            q_list[l - 1] = nxt
    return h_list, d_list, q_list, starts, h_list[-1].astype(jnp.float32), j


def _jac_fwd_kernel(spec, n_rows, x_ref, *refs):
    nw = _weights_per_layer(spec)[1]
    w_refs = refs[:nw]
    wt_refs = refs[nw:2 * nw]
    b_refs = refs[2 * nw:2 * nw + spec.n_layers]
    y_ref = refs[2 * nw + spec.n_layers]
    j_ref = refs[2 * nw + spec.n_layers + 1]

    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
    valid = (i * spec.block_rows + rows) < n_rows
    x = jnp.where(valid, x_ref[:], 0.0)
    weights = [w[:] for w in w_refs]
    weights_t = [w[:] for w in wt_refs]
    biases = [b[:] for b in b_refs]
    *_, y, j = _jac_sweeps(spec, x, weights, weights_t, biases)
    y_ref[:] = y
    j_ref[:] = j


def _make_jac_bwd_kernel(spec, n_rows):
    counts, nw = _weights_per_layer(spec)
    n_l = spec.n_layers
    dtype = jnp.dtype(spec.compute_dtype)

    def dot(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=jnp.float32)

    def dot_t(a, b):  # a^T @ b
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(x_ref, gy_ref, gj_ref, *refs):
        w_refs = refs[:nw]
        wt_refs = refs[nw:2 * nw]
        b_refs = refs[2 * nw:2 * nw + n_l]
        dx_ref = refs[2 * nw + n_l]
        dw_refs = refs[2 * nw + n_l + 1:2 * nw + n_l + 1 + nw]
        db_refs = refs[2 * nw + n_l + 1 + nw:]

        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
        valid = (i * spec.block_rows_bwd + rows) < n_rows
        x = jnp.where(valid, x_ref[:], 0.0)
        gy = jnp.where(valid, gy_ref[:], 0.0)
        gj = jnp.where(valid, gj_ref[:], 0.0)

        weights = [w[:] for w in w_refs]
        weights_t = [w[:] for w in wt_refs]
        biases = [b[:] for b in b_refs]
        h_list, d_list, q_list, starts, _, _ = _jac_sweeps(
            spec, x, weights, weights_t, biases)

        # ---- reverse of the J-pass (runs upward l = 0..L-1) -------------
        # J-pass:  p_l = q_l * d_l ; q_{l-1} = s_l p_l @ Wh_l^T ;
        #          j += s_l p_l @ Wx_l^T (skips) ; j += q_{-1}-style at l=0.
        # Cotangents: qbar_{l-1} -> pbar_l -> (qbar_l, dbar_l, dWh, dWx).
        dbar = [None] * n_l          # cotangent on d_l
        qbar = gj                    # cotangent on the quantity flowing INTO
        #                              layer l's transposed matmul (at l=0
        #                              that quantity lands directly in j)
        for l in range(n_l - 1):
            w_h = weights[starts[l]]
            p = q_list[l] * d_list[l]
            # pbar from the Wh^T matmul that produced q_{l-1} (or j at l=0)
            pbar = spec.scales[l] * dot(qbar, w_h)
            # dWh from that same matmul: q_{l-1}[t,i] = s sum_j p[t,j] Wh[i,j]
            dwh = spec.scales[l] * dot_t(qbar, p)
            _accum_pid(dw_refs[starts[l]], dwh, i, init=True)
            if spec.has_skip[l]:
                w_x = weights[starts[l] + 1]
                pbar = pbar + spec.scales[l] * dot(gj, w_x)
                dwx = spec.scales[l] * dot_t(gj, p)
                _accum_pid(dw_refs[starts[l] + 1], dwx, i, init=True)
            dbar[l] = pbar * q_list[l]
            qbar = pbar * d_list[l]
        # last layer: q_{L-1} = s * broadcast(Wh_L[:,0]): contributes to
        # column 0 of Wh_L (and Wx_L for skips)
        l = n_l - 1
        dwh_last_col = spec.scales[l] * jnp.sum(qbar, axis=0)  # [w_{L-1}]
        if spec.has_skip[l]:
            dwx_last_col = spec.scales[l] * jnp.sum(gj, axis=0)
        dbar[l] = None  # linear final layer: d == 1, no dependence

        # ---- standard reverse of the forward (downward l=L-1..0) --------
        # z_l cotangent: hbar_l * d_l + dbar_l * sigma''(z_l)
        hbar = gy
        dx = jnp.zeros(x.shape, jnp.float32)
        for l in reversed(range(n_l)):
            zbar = hbar * d_list[l]
            if dbar[l] is not None:
                zbar = zbar + dbar[l] * _act_grad2_from_d(spec.acts[l],
                                                          d_list[l])
            _accum_pid(db_refs[l], jnp.sum(zbar, axis=0, keepdims=True), i,
                       init=True)
            zs = zbar * spec.scales[l]
            h_prev = h_list[l - 1] if l > 0 else x
            dwh = dot_t(h_prev, zs)
            last = l == n_l - 1
            if last:
                # J-pass contribution lands in column 0 of the final weight
                col0 = jax.lax.broadcasted_iota(jnp.int32, dwh.shape, 1) == 0
                dwh = jnp.where(col0, dwh + dwh_last_col[:, None], dwh)
            # the last layer's dW blocks are first touched HERE (the J-pass
            # reverse never writes them), so they need the pid-0 init
            _accum_pid(dw_refs[starts[l]], dwh, i, init=last)
            if spec.has_skip[l]:
                dwx = dot_t(x, zs)
                if last:
                    c0 = jax.lax.broadcasted_iota(jnp.int32, dwx.shape, 1) == 0
                    dwx = jnp.where(c0, dwx + dwx_last_col[:, None], dwx)
                _accum_pid(dw_refs[starts[l] + 1], dwx, i, init=last)
                dx = dx + dot(zs, weights_t[starts[l] + 1])
            gh = dot(zs, weights_t[starts[l]])
            if l > 0:
                hbar = gh
            else:
                dx = dx + gh
        dx_ref[:] = dx

    return kernel


def _accum_pid(ref, val, pid, init):
    """Accumulate into a grid-revisited block.  ``init=True`` writers run
    FIRST for that ref within the kernel body; on pid 0 they initialize."""
    if init:
        @pl.when(pid == 0)
        def _():
            ref[:] = val

        @pl.when(pid > 0)
        def _():
            ref[:] = ref[:] + val
    else:
        ref[:] = ref[:] + val


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def chain_mlp_with_grad0(spec: ChainSpec, x, *flat):
    """(y, j): full chain output and d y[...,0] / d x, fused.  f32 only."""
    return _jac_fwd_call(spec, x, flat)


def _jac_fwd_call(spec, x, flat):
    n, e = x.shape
    t = spec.block_rows
    grid = (pl.cdiv(n, t),)
    nw = _weights_per_layer(spec)[1]
    w_shapes = _flat_weight_shapes(spec)
    ws, bs = flat[:nw], flat[nw:]
    wts = tuple(w.T for w in ws)  # XLA transposes once; tiny vs the kernel

    in_specs = [pl.BlockSpec((t, e), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for s in w_shapes:
        in_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for s in w_shapes:
        in_specs.append(pl.BlockSpec((s[1], s[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(spec.n_layers):
        in_specs.append(pl.BlockSpec((1, spec.dims[l + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops = 4 * n * sum(a * b for a, b in w_shapes)
    return pl.pallas_call(
        functools.partial(_jac_fwd_kernel, spec, n),
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((t, spec.dims[-1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((t, e), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, spec.dims[-1]), jnp.float32),
                   jax.ShapeDtypeStruct((n, e), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * n * (2 * e + spec.dims[-1]),
            transcendentals=n * 512),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(x, *ws, *wts, *bs)


def _jac_bwd_call(spec, x, gy, gj, flat):
    n, e = x.shape
    t = spec.block_rows_bwd
    grid = (pl.cdiv(n, t),)
    counts, nw = _weights_per_layer(spec)
    w_shapes = _flat_weight_shapes(spec)
    ws, bs = flat[:nw], flat[nw:]
    wts = tuple(w.T for w in ws)

    in_specs = [
        pl.BlockSpec((t, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, spec.dims[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for s in w_shapes:
        in_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for s in w_shapes:
        in_specs.append(pl.BlockSpec((s[1], s[0]), lambda i: (0, 0),
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
    flops = 12 * n * sum(a * b for a, b in w_shapes)
    res = pl.pallas_call(
        _make_jac_bwd_kernel(spec, n),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * n * (3 * e + spec.dims[-1]),
            transcendentals=n * 512),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(x, gy, gj, *ws, *wts, *bs)
    dx = res[0]
    return dx, tuple(res[1:])


def _jac_fwd_rule(spec, x, *flat):
    out = _jac_fwd_call(spec, x, flat)
    return out, (x, flat)


def _jac_bwd_rule(spec, res, g):
    x, flat = res
    gy, gj = g
    dx, dflat = _jac_bwd_call(spec, x, gy, gj, flat)
    return (dx,) + tuple(dflat)


chain_mlp_with_grad0.defvjp(_jac_fwd_rule, _jac_bwd_rule)


def chain_mlp_with_grad0_reference(spec: ChainSpec, x, *flat):
    """XLA reference of (y, d y0/dx) for parity tests."""
    y = chain_mlp_reference(spec, x, *flat)

    def y0(pt):
        return chain_mlp_reference(spec, pt[None], *flat)[0, 0]

    j = jax.vmap(jax.grad(y0))(x)
    return y, j
