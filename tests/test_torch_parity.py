"""Numeric parity vs PyTorch replicas of the reference field architectures.

The reference networks (``network/field.py``) are rebuilt here in PyTorch
from their documented spec (weight-normalized linears, softplus beta=100,
skip concat / sqrt(2), NeRF trunk with post-activation skip), loaded with
random weights, converted into this framework's parameter pytrees, and the
forwards (and the SDF input gradient, which the reference computes by double
backward) are asserted allclose.  This pins layer ordering, the positional
encoding layout, weight-norm parameterization, and activation constants.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from nunerf_tpu.fields.mlp import Predictor
from nunerf_tpu.fields.nerf import NeRFNetwork
from nunerf_tpu.fields.sdf import SDFNetwork, sdf_value_feature_grad

torch.manual_seed(0)


def torch_posenc(x, multires):
    out = [x]
    for f in 2.0 ** torch.arange(multires, dtype=x.dtype):
        out.append(torch.sin(x * f))
        out.append(torch.cos(x * f))
    return torch.cat(out, -1)


def wn_to_jax(lin):
    """torch weight_norm(Linear) -> WNDense {v, g, b} (kernel transposed)."""
    return {
        "v": jnp.asarray(lin.weight_v.detach().numpy().T),
        "g": jnp.asarray(lin.weight_g.detach().numpy().reshape(-1)),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }


def lin_to_jax(lin):
    return {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy()),
    }


def _randomize_wn(lin):
    """Make g independent of ||v|| so the test is strict about the
    W = g * v/||v|| parameterization."""
    with torch.no_grad():
        lin.weight_g.copy_(torch.rand_like(lin.weight_g) + 0.5)


class TorchSDF(nn.Module):
    """Reference SDFNetwork spec (field.py:64-184): 8x256 WN MLP, skip at 4
    (concat input / sqrt(2)), softplus(beta=100), posenc multires 6."""

    def __init__(self, d_out=257, d_hidden=256, n_layers=8, skip=4,
                 multires=6):
        super().__init__()
        self.multires, self.skip = multires, skip
        in_dim = 3 * (1 + 2 * multires)
        dims = [in_dim] + [d_hidden] * n_layers + [d_out]
        self.lins = nn.ModuleList()
        for l in range(len(dims) - 1):
            # the pre-skip layer shrinks so that cat([h, inputs]) == dims[l]
            out_dim = dims[l + 1] - dims[0] if l + 1 == skip else dims[l + 1]
            lin = nn.utils.weight_norm(nn.Linear(dims[l], out_dim))
            _randomize_wn(lin)
            self.lins.append(lin)

    def forward(self, x):
        inputs = torch_posenc(x, self.multires)
        h = inputs
        for l, lin in enumerate(self.lins):
            if l == self.skip:
                h = torch.cat([h, inputs], -1) / np.sqrt(2)
            h = lin(h)
            if l < len(self.lins) - 1:
                h = torch.nn.functional.softplus(h, beta=100)
        return h


def test_sdf_forward_and_gradient_parity():
    tmod = TorchSDF()
    jmod = SDFNetwork(d_out=257, n_layers=8, skip_in=(4,), multires=6)
    params = jmod.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    new = dict(params["params"])
    for l, lin in enumerate(tmod.lins):
        assert f"lin{l}" in new, sorted(new)
        assert new[f"lin{l}"]["v"].shape == lin.weight_v.shape[::-1]
        new[f"lin{l}"] = wn_to_jax(lin)
    params = {"params": new}

    rs = np.random.RandomState(1)
    x = (rs.randn(64, 3) * 0.4).astype(np.float32)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = np.asarray(jmod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # input gradient of the sdf channel (reference computes this with
    # autograd.grad create_graph=True, field.py:158-170)
    xt = torch.from_numpy(x).requires_grad_(True)
    y = tmod(xt)[..., :1]
    (gref,) = torch.autograd.grad(y.sum(), xt)
    _, _, gours = sdf_value_feature_grad(jmod.apply, params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gours), gref.numpy(), atol=5e-4)


class TorchNeRF(nn.Module):
    """Reference NeRFNetwork spec (field.py:212-305, nerf-pytorch lineage):
    plain linears, post-activation skip concat [enc, h]."""

    def __init__(self, D=8, W=256, input_ch=84, input_ch_views=27, skip=4):
        super().__init__()
        self.skip = skip
        self.pts = nn.ModuleList(
            [nn.Linear(input_ch, W)] +
            [nn.Linear(W + (input_ch if i - 1 == skip else 0), W)
             for i in range(1, D)])
        self.alpha = nn.Linear(W + (input_ch if skip == D - 1 else 0), 1)
        self.feature = nn.Linear(W + (input_ch if skip == D - 1 else 0), W)
        self.views = nn.Linear(W + input_ch_views, W // 2)
        self.rgb = nn.Linear(W // 2, 3)

    def forward(self, pts, view):
        enc = torch_posenc(pts, 10)
        venc = torch_posenc(view, 4)
        h = enc
        for i, lin in enumerate(self.pts):
            h = torch.relu(lin(h))
            if i == self.skip:
                h = torch.cat([enc, h], -1)
        alpha = self.alpha(h)
        feat = self.feature(h)
        hv = torch.relu(self.views(torch.cat([feat, venc], -1)))
        return alpha, self.rgb(hv)


def test_nerf_forward_parity():
    tmod = TorchNeRF()
    jmod = NeRFNetwork()
    params = jmod.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)),
                       jnp.zeros((1, 3)))
    new = dict(params["params"])
    for i, lin in enumerate(tmod.pts):
        new[f"pts_{i}"] = lin_to_jax(lin)
    new["alpha"] = lin_to_jax(tmod.alpha)
    new["feature"] = lin_to_jax(tmod.feature)
    new["views_0"] = lin_to_jax(tmod.views)
    new["rgb"] = lin_to_jax(tmod.rgb)
    params = {"params": new}

    rs = np.random.RandomState(2)
    d = rs.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = 1.0 + rs.rand(32, 1).astype(np.float32) * 3
    pts4 = np.concatenate([d, 1.0 / r], -1).astype(np.float32)
    views = rs.randn(32, 3).astype(np.float32)

    with torch.no_grad():
        a_ref, c_ref = tmod(torch.from_numpy(pts4), torch.from_numpy(views))
    a, c = jmod.apply(params, jnp.asarray(pts4), jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=2e-5)


def test_predictor_parity():
    """make_predictor spec (field.py:371-408): 3 hidden WN 256 + WN out,
    sigmoid."""
    tmod = nn.Sequential(
        nn.utils.weight_norm(nn.Linear(259, 256)), nn.ReLU(),
        nn.utils.weight_norm(nn.Linear(256, 256)), nn.ReLU(),
        nn.utils.weight_norm(nn.Linear(256, 256)), nn.ReLU(),
        nn.utils.weight_norm(nn.Linear(256, 2)), nn.Sigmoid())
    for m in tmod:
        if isinstance(m, nn.Linear):
            _randomize_wn(m)

    jmod = Predictor(out_dim=2, n_hidden=3, activation="sigmoid")
    params = jmod.init(jax.random.PRNGKey(0), jnp.zeros((1, 259)))
    lins = [m for m in tmod if isinstance(m, nn.Linear)]
    names = ["hidden_0", "hidden_1", "hidden_2", "out"]
    assert sorted(params["params"]) == sorted(names)
    params = {"params": {n: wn_to_jax(l) for n, l in zip(names, lins)}}

    x = np.random.RandomState(3).randn(16, 259).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = np.asarray(jmod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
