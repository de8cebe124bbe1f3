"""Import the ACTUAL reference code (/root/reference) for parity testing.

The reference is PyTorch+CUDA and written for an older environment; this
helper makes `network/field.py` and `utils/ref_utils.py` importable on the
CPU-only test rig WITHOUT modifying them:

* stubs for unavailable imports that parity tests never exercise
  (mcubes, plyfile, skimage, h5py, transforms3d);
* a real bilinear implementation of ``nvdiffrast.torch.texture``
  (filter_mode='linear', boundary_mode='clamp' — the only call the shading
  networks make, field.py:721);
* a ``TorchFunctionMode`` that rewrites device='cuda:0' kwargs and
  ``.cuda()`` calls to CPU (the reference hard-codes CUDA devices, e.g.
  field.py:638, ref_utils.py:81);
* ``np.math = math`` (removed in numpy>=1.25; used by ref_utils.py:34).

Tests built on this compare our JAX fields against the reference's OWN
forward passes, not replicas.
"""

import math
import os
import sys
import types
from contextlib import contextmanager

import numpy as np
import torch

REF_DIR = "/root/reference"


def _bilinear_texture(tex, uv, filter_mode="linear", boundary_mode="clamp"):
    """nvdiffrast.torch.texture for the reference's FG-LUT lookup:
    tex [1,H,W,C], uv [1,N,1,2] in [0,1] (u = x = cols), texel centers at
    (i+0.5)/W, bilinear filtering, clamped boundary."""
    assert filter_mode == "linear" and boundary_mode == "clamp"
    t = tex[0]
    H, W, C = t.shape
    u = uv[..., 0].reshape(-1) * W - 0.5
    v = uv[..., 1].reshape(-1) * H - 0.5
    u0 = torch.clamp(torch.floor(u), 0, W - 1)
    v0 = torch.clamp(torch.floor(v), 0, H - 1)
    u1 = torch.clamp(u0 + 1, 0, W - 1)
    v1 = torch.clamp(v0 + 1, 0, H - 1)
    fu = torch.clamp(u - u0, 0, 1)[:, None]
    fv = torch.clamp(v - v0, 0, 1)[:, None]
    u0, u1, v0, v1 = u0.long(), u1.long(), v0.long(), v1.long()
    out = (t[v0, u0] * (1 - fu) * (1 - fv) + t[v0, u1] * fu * (1 - fv)
           + t[v1, u0] * (1 - fu) * fv + t[v1, u1] * fu * fv)
    return out.reshape(uv.shape[0], uv.shape[1], uv.shape[2], C)


class CudaToCpu(torch.overrides.TorchFunctionMode):
    """Rewrites the reference's hard-coded CUDA placements to CPU."""

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs["device"] = "cpu"
        if func is torch.Tensor.cuda:
            return args[0]
        return func(*args, **kwargs)


def _install_stubs():
    np.math = math
    for name, attrs in [
        ("mcubes", {"marching_cubes": None}),
        ("plyfile", {"PlyData": object, "PlyElement": object}),
        ("skimage", {}),
        ("skimage.io", {"imread": None, "imsave": None}),
        ("h5py", {"File": object}),
        ("transforms3d", {}),
        ("transforms3d.axangles", {"mat2axangle": None, "axangle2mat": None}),
        ("transforms3d.quaternions", {"mat2quat": None, "quat2mat": None}),
        ("transforms3d.euler", {"mat2euler": None, "euler2mat": None}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    if "nvdiffrast" not in sys.modules:
        nv = types.ModuleType("nvdiffrast")
        nvt = types.ModuleType("nvdiffrast.torch")
        nvt.texture = _bilinear_texture
        nv.torch = nvt
        sys.modules["nvdiffrast"] = nv
        sys.modules["nvdiffrast.torch"] = nvt


def load_reference():
    """Import and return (network.field, utils.ref_utils) from the reference."""
    _install_stubs()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import network.field as ref_field
    import utils.ref_utils as ref_utils
    return ref_field, ref_utils


def load_reference_renderer():
    """Import the reference's zero-thickness renderer module
    (``network/renderer_zerothick.py``) on the CPU test rig.

    Beyond ``load_reference``'s stubs this needs: open3d / trimesh / pymesh /
    imageio (mesh + viz tooling the render path never touches with
    ``training=False``) and the OptiX binding chain (``network.tracing_optix``
    imports ``optix``+``cupy`` and builds CUDA pipelines at class-init; the
    stage-1 renderer constructs no Scene, so a module stub suffices)."""
    _install_stubs()
    for name, attrs in [
        ("open3d", {}),
        ("trimesh", {"Trimesh": object, "PointCloud": object,
                     "load": lambda *a, **k: None}),
        ("trimesh.exchange", {}),
        ("trimesh.exchange.export", {"export_mesh": None}),
        ("trimesh.curvature", {"discrete_gaussian_curvature_measure": None,
                               "discrete_mean_curvature_measure": None,
                               "sphere_ball_intersection": None}),
        ("pymesh", {}),
        ("imageio", {"imread": None, "imwrite": None}),
        ("optix", {}),
        ("cupy", {}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    if "network.tracing_optix" not in sys.modules:
        stub = types.ModuleType("network.tracing_optix")
        stub.optix_mesh = object
        sys.modules["network.tracing_optix"] = stub
    import network.renderer_zerothick as ref_rz
    return ref_rz


def load_reference_renderer_shell():
    """Import the reference's non-zero-thickness renderer module
    (``network/renderer.py`` — the curvature-shell Stage2Renderer)."""
    load_reference_renderer()  # installs every stub the module needs
    import network.renderer as ref_r
    return ref_r


@contextmanager
def reference_cwd():
    """The reference loads assets by relative path (field.py:583)."""
    old = os.getcwd()
    os.chdir(REF_DIR)
    try:
        yield
    finally:
        os.chdir(old)


# ---- weight transfer helpers (torch -> our flax pytrees) ------------------

def wn_to_jax(lin):
    """torch weight_norm(Linear) -> WNDense {v, g, b} (kernel transposed)."""
    import jax.numpy as jnp
    return {
        "v": jnp.asarray(lin.weight_v.detach().numpy().T),
        "g": jnp.asarray(lin.weight_g.detach().numpy().reshape(-1)),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }


def predictor_to_jax(seq):
    """reference make_predictor (Sequential of WN Linears at 0,2,4,6) ->
    our Predictor param dict {hidden_0..2, out}."""
    lins = [m for m in seq if isinstance(m, torch.nn.Linear)]
    names = [f"hidden_{i}" for i in range(len(lins) - 1)] + ["out"]
    return {n: wn_to_jax(l) for n, l in zip(names, lins)}


def randomize_wn(module):
    """Decouple g from ||v|| everywhere so tests are strict about the
    W = g * v/||v|| parameterization."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.Linear) and hasattr(m, "weight_g"):
                m.weight_g.copy_(torch.rand_like(m.weight_g) + 0.5)
