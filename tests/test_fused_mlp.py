"""Fused chain-MLP kernel: parity vs the XLA modules (interpret mode on CPU).

The kernel is the TPU fast path for every MLP chain in the framework; these
tests pin its math (fwd + custom VJP) against the reference modules.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunerf_tpu.ops.fused_mlp import (ChainSpec, chain_mlp_reference,
                                      fused_chain_mlp)

rs = np.random.RandomState(0)


def _make_flat(spec):
    shapes = []
    prev = spec.dims[0]
    for l in range(spec.n_layers):
        w = spec.dims[l + 1]
        shapes.append((prev, w))
        if spec.has_skip[l]:
            shapes.append((spec.dims[0], w))
        prev = w
    flat = [jnp.asarray(rs.randn(*s).astype(np.float32) * 0.2) for s in shapes]
    flat += [jnp.asarray(rs.randn(1, spec.dims[l + 1]).astype(np.float32) * 0.1)
             for l in range(spec.n_layers)]
    return flat


@pytest.mark.parametrize("spec,n", [
    # plain relu chain with a non-tile-multiple row count (mask path)
    (ChainSpec((256, 128, 128, 128), ("relu", "relu", "none"),
               (False,) * 3, (1.0,) * 3), 300),
    # NeuS-style pre-concat skip with 1/sqrt(2) scale + softplus100
    (ChainSpec((128, 128, 128, 128), ("softplus100", "softplus100", "none"),
               (False, True, False), (1.0, 1 / math.sqrt(2), 1.0)), 200),
])
@pytest.mark.parametrize("bwd_mode", ["accum", "partial"])
def test_fused_chain_parity(spec, n, bwd_mode, monkeypatch):
    monkeypatch.setenv("NUNERF_FUSED_BWD", bwd_mode)
    flat = _make_flat(spec)
    x = jnp.asarray(rs.randn(n, spec.dims[0]).astype(np.float32))
    y1 = fused_chain_mlp(spec, x, *flat)
    y2 = chain_mlp_reference(spec, x, *flat)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rs.randn(*y1.shape).astype(np.float32))
    g1 = jax.grad(lambda x, f: jnp.sum(fused_chain_mlp(spec, x, *f) * g),
                  argnums=(0, 1))(x, flat)
    g2 = jax.grad(lambda x, f: jnp.sum(chain_mlp_reference(spec, x, *f) * g),
                  argnums=(0, 1))(x, flat)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=2e-5)


def test_predictor_fused_parity():
    from nunerf_tpu.fields.mlp import Predictor
    x = jnp.asarray(rs.randn(150, 131).astype(np.float32))
    p0 = Predictor(3, n_hidden=2, activation="exp", exp_max=0.5,
                   final_bias=0.2)
    p1 = Predictor(3, n_hidden=2, activation="exp", exp_max=0.5,
                   final_bias=0.2, fused=True)
    params = p0.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p1.init(jax.random.PRNGKey(0), x)))
    y0, y1 = p0.apply(params, x), p1.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    g0 = jax.grad(lambda p: jnp.sum(p0.apply(p, x) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(p1.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)


def test_sdf_fused_parity():
    from nunerf_tpu.fields.sdf import SDFNetwork, fused_sdf_apply
    x = jnp.asarray(rs.randn(100, 3).astype(np.float32)) * 0.5
    s = SDFNetwork(n_layers=4, d_hidden=128, d_out=129, skip_in=(2,))
    params = s.init(jax.random.PRNGKey(1), x)
    y0 = s.apply(params, x)
    y1 = fused_sdf_apply(s, params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    g0 = jax.grad(lambda p: jnp.sum(s.apply(p, x)[:, 0] ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(fused_sdf_apply(s, p, x)[:, 0] ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)


def test_nerf_fused_parity():
    from nunerf_tpu.fields.nerf import NeRFNetwork
    pts4 = jnp.asarray(rs.randn(90, 4).astype(np.float32))
    views = jnp.asarray(rs.randn(90, 3).astype(np.float32))
    n0 = NeRFNetwork(depth=4, width=128, skips=(2,), rgb_bias_init=0.3)
    n1 = NeRFNetwork(depth=4, width=128, skips=(2,), rgb_bias_init=0.3,
                     fused=True)
    p = n0.init(jax.random.PRNGKey(0), pts4, views)
    a0, r0 = n0.apply(p, pts4, views)
    a1, r1 = n1.apply(p, pts4, views)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-5, atol=1e-5)


def test_chain_with_grad0_parity():
    """Value+jacobian kernel incl. the hand-derived second-order VJP."""
    from nunerf_tpu.ops.fused_mlp import (chain_mlp_with_grad0,
                                          chain_mlp_with_grad0_reference)
    spec = ChainSpec((39, 128, 89, 128, 129),
                     ("softplus100",) * 3 + ("none",),
                     (False, False, True, False),
                     (1.0, 1.0, 1 / math.sqrt(2), 1.0))
    flat = _make_flat(spec)
    x = jnp.asarray(rs.randn(150, 39).astype(np.float32))
    y1, j1 = chain_mlp_with_grad0(spec, x, *flat)
    y2, j2 = chain_mlp_with_grad0_reference(spec, x, *flat)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=1e-4, atol=1e-4)

    gy = jnp.asarray(rs.randn(*y1.shape).astype(np.float32))
    gj = jnp.asarray(rs.randn(*j1.shape).astype(np.float32))

    def loss(fn, x, f):
        y, j = fn(spec, x, *f)
        return jnp.sum(y * gy) + jnp.sum(j * gj)

    g1 = jax.grad(loss, argnums=(1, 2))(chain_mlp_with_grad0, x, flat)
    g2 = jax.grad(loss, argnums=(1, 2))(chain_mlp_with_grad0_reference, x, flat)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-4)


def test_fused_sdf_all_parity():
    from nunerf_tpu.fields.sdf import (SDFNetwork, fused_sdf_all,
                                       sdf_value_feature_grad)
    x = jnp.asarray(rs.randn(100, 3).astype(np.float32)) * 0.5
    s = SDFNetwork(n_layers=4, d_hidden=128, d_out=129, skip_in=(2,))
    params = s.init(jax.random.PRNGKey(1), x)
    v0, f0, g0 = sdf_value_feature_grad(s.apply, params, x)
    v1, f1, g1 = fused_sdf_all(s, params, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)

    # training-style gradient THROUGH the jacobian (eikonal-like loss)
    def eik(fn):
        def L(p):
            v, f, g = fn(p)
            return (jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
                    + jnp.mean(v ** 2) + jnp.mean(f ** 2))
        return jax.grad(L)(params)

    ga = eik(lambda p: sdf_value_feature_grad(s.apply, p, x))
    gb = eik(lambda p: fused_sdf_all(s, p, x))
    for a, b in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(ga)):
        scale = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-4)
