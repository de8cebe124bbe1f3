"""Relighting path: material export (cli relight) golden-tested against a
fixed-seed checkpoint, and the headless-Blender driver
(tools/relight_backend.py, mirroring blender_backend/relight_backend.py:15-110)
dry-run end-to-end behind a bpy stub."""

import os
import sys
import types
from argparse import Namespace
from unittest.mock import MagicMock

import jax
import numpy as np
import pytest

from nunerf_tpu.cli import cmd_relight
from nunerf_tpu.tracing.mesh_ops import extract_geometry, save_ply
from nunerf_tpu.train.trainer import save_checkpoint

CFG_YAML = """
name: relight_test
network: shape
database_name: nerf/unused
is_nerf: true
get_mask: false
zero_thickness: true
shader_config: {sphere_direction: false, human_light: false}
loss: [nerf_render]
key_metric_name: psnr
"""


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("relight")
    cfg_path = str(root / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_YAML)

    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models.stage1 import ShapeRenderer
    renderer = ShapeRenderer(load_cfg(cfg_path))
    params = renderer.init_params(jax.random.PRNGKey(7))
    ckpt = str(root / "model.ckpt")
    save_checkpoint(ckpt, 0, params, {}, 0.0)

    verts, tris = extract_geometry(
        lambda p: np.linalg.norm(p, axis=-1) - 0.5, resolution=24, bound=1.0)
    mesh = str(root / "mesh.ply")
    save_ply(mesh, verts, tris)

    out = str(root / "materials")
    cmd_relight(Namespace(cfg=cfg_path, ckpt=ckpt, mesh=mesh, output=out))
    return root, out, mesh, len(verts)


def test_material_export_golden(export_dir):
    _, out, _, nv = export_dir
    m = np.load(os.path.join(out, "metallic.npy"))
    r = np.load(os.path.join(out, "roughness.npy"))
    a = np.load(os.path.join(out, "albedo.npy"))
    assert m.shape == (nv, 1) and r.shape == (nv, 1) and a.shape == (nv, 3)
    for x in (m, r, a):
        assert np.isfinite(x).all()
        assert (x >= 0).all() and (x <= 1).all()
    # golden values for PRNGKey(7) geometric init: the shading net's material
    # heads start near their configured priors (metallic/roughness sigmoid
    # biases, field.py:557-650), so drift here means an init-contract break
    assert abs(float(m.mean()) - _GOLDEN["metallic"]) < 2e-3
    assert abs(float(r.mean()) - _GOLDEN["roughness"]) < 2e-3
    assert abs(float(a.mean()) - _GOLDEN["albedo"]) < 2e-3


# pinned from the fixed-seed run (see test_material_export_golden)
_GOLDEN = {"metallic": 0.51338, "roughness": 0.51707, "albedo": 0.49357}


def _make_bpy_stub(nv, rendered):
    bpy = MagicMock(name="bpy")
    mesh = MagicMock(name="mesh")
    mesh.vertices = list(range(nv))
    attrs = {}

    def new_attr(name, type, domain):
        a = MagicMock(name=f"attr_{name}")
        store = {}

        def foreach_set(key, flat):
            store[key] = np.asarray(flat).copy()
        a.data.foreach_set = foreach_set
        attrs[name] = store
        return a

    mesh.color_attributes.new = new_attr
    obj = MagicMock(name="obj")
    obj.data = mesh
    bpy.context.selected_objects = [obj]

    def render(write_still=False):
        path = bpy.context.scene.render.filepath
        with open(path, "wb") as f:
            f.write(b"png")
        rendered.append(path)

    bpy.ops.render.render = render
    return bpy, attrs


def test_relight_backend_dry_run(export_dir, monkeypatch):
    root, out, mesh_path, nv = export_dir
    hdr = str(root / "env.hdr")
    with open(hdr, "wb") as f:
        f.write(b"hdr")
    render_out = str(root / "renders")

    rendered = []
    bpy, attrs = _make_bpy_stub(nv, rendered)
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    monkeypatch.setattr(sys, "argv", [
        "blender", "--", "--mesh", mesh_path, "--materials", out,
        "--hdr", hdr, "--out", render_out, "--n-views", "3",
        "--resolution", "8"])

    from nunerf_tpu.tools import relight_backend
    relight_backend.main()

    # two attribute layers: albedo RGB + RG-packed metallic/roughness
    # (the reference's layer scheme, blender_backend/relight_backend.py:30-46)
    for name in ("albedo", "mat_mr"):
        assert attrs[name]["color"].shape == (nv * 4,)
        assert np.isfinite(attrs[name]["color"]).all()
    # channels round-trip into the vertex-color attributes
    a = np.load(os.path.join(out, "albedo.npy"))
    m = np.load(os.path.join(out, "metallic.npy"))
    r = np.load(os.path.join(out, "roughness.npy"))
    np.testing.assert_allclose(
        attrs["albedo"]["color"].reshape(nv, 4)[:, :3], a, rtol=1e-6)
    mr = attrs["mat_mr"]["color"].reshape(nv, 4)
    np.testing.assert_allclose(mr[:, 0], m[:, 0], rtol=1e-6)
    np.testing.assert_allclose(mr[:, 1], r[:, 0], rtol=1e-6)
    # turntable rendered every requested view
    assert len(rendered) == 3
    assert all(os.path.exists(p) for p in rendered)


# --------------------------------------------------------------------------
# node-graph golden test (structured fake node tree, no bpy required:
# build_principled_graph only touches the material object it is given)
# --------------------------------------------------------------------------

class _FakeSocket:
    def __init__(self, node, name):
        self.node, self.name = node, name
        self.default_value = None


class _FakeNode:
    def __init__(self, type_name, inputs=(), outputs=()):
        self.type_name = type_name
        self.layer_name = None
        self.inputs = {n: _FakeSocket(self, n) for n in inputs}
        self.outputs = {n: _FakeSocket(self, n) for n in outputs}


_NODE_SOCKETS = {
    # Blender 4.x names — exercises the modern Separate Color path
    "ShaderNodeVertexColor": ((), ("Color", "Alpha")),
    "ShaderNodeSeparateColor": (("Color",), ("Red", "Green", "Blue")),
}


class _FakeNodes:
    def __init__(self):
        self.by_name = {"Principled BSDF": _FakeNode(
            "BSDF_PRINCIPLED",
            inputs=("Base Color", "Metallic", "Roughness", "Specular",
                    "Specular Tint", "Sheen Tint", "Clearcoat Roughness"))}
        self.created = []

    def __getitem__(self, k):
        return self.by_name[k]

    def new(self, type_name):
        if type_name not in _NODE_SOCKETS:
            raise KeyError(type_name)
        ins, outs = _NODE_SOCKETS[type_name]
        node = _FakeNode(type_name, ins, outs)
        self.created.append(node)
        return node


class _FakeLinks:
    def __init__(self):
        self.records = []

    def new(self, from_sock, to_sock):
        self.records.append((from_sock.node, from_sock.name,
                             to_sock.node, to_sock.name))


class _FakeMaterial:
    def __init__(self):
        self.node_tree = types.SimpleNamespace(nodes=_FakeNodes(),
                                               links=_FakeLinks())


def test_principled_graph_golden():
    """The constructed node graph must match the reference's
    (blender_backend/relight_backend.py:52-73): albedo layer -> Base Color,
    one RG-packed layer -> Separate Color -> Metallic/Roughness, neutral
    specular/sheen/clearcoat socket defaults."""
    from nunerf_tpu.tools.relight_backend import build_principled_graph

    mat = _FakeMaterial()
    bsdf, sep = build_principled_graph(mat, "albedo", "mat_mr")

    assert bsdf.inputs["Specular"].default_value == 0.5
    assert bsdf.inputs["Specular Tint"].default_value == 0.0
    assert bsdf.inputs["Sheen Tint"].default_value == 0.0
    assert bsdf.inputs["Clearcoat Roughness"].default_value == 0.0

    def layer_of(node):
        return getattr(node, "layer_name", None)

    edges = {(layer_of(f) or f.type_name, fn, layer_of(t) or t.type_name, tn)
             for f, fn, t, tn in mat.node_tree.links.records}
    assert ("albedo", "Color", "BSDF_PRINCIPLED", "Base Color") in edges
    assert ("mat_mr", "Color", "ShaderNodeSeparateColor", "Color") in edges
    assert ("mat_mr", "Red", "BSDF_PRINCIPLED", "Metallic") in edges or \
           ("ShaderNodeSeparateColor", "Red", "BSDF_PRINCIPLED",
            "Metallic") in edges
    assert ("ShaderNodeSeparateColor", "Green", "BSDF_PRINCIPLED",
            "Roughness") in edges
    assert len(mat.node_tree.links.records) == 4


def test_relighting_pose_math():
    """Camera-pose helpers are pure numpy: every pose must be a valid
    rotation looking at the origin, and the Blender conversion must put the
    camera's -z axis (Blender view direction) on the to-origin direction."""
    from nunerf_tpu.tools.relight_backend import (blender_camera_transform,
                                                  quat_from_rotation,
                                                  relighting_poses)

    poses = relighting_poses(7, azimuth_deg=30.0, elevation_deg=45.0,
                             dist=3.0)
    assert poses.shape == (7, 3, 4)
    for pose in poses:
        R, t = pose[:, :3], pose[:, 3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        center = -R.T @ t
        np.testing.assert_allclose(np.linalg.norm(center), 3.0, atol=1e-8)
        # OpenCV forward (+z row of R) points at the origin
        np.testing.assert_allclose(R[2], -center / np.linalg.norm(center),
                                   atol=1e-8)

        loc, quat = blender_camera_transform(pose)
        np.testing.assert_allclose(loc, center, atol=1e-8)
        w, x, y, z = quat
        R_b = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        view_dir = R_b @ np.array([0.0, 0.0, -1.0])   # Blender looks down -z
        np.testing.assert_allclose(view_dir, -center / np.linalg.norm(center),
                                   atol=1e-7)

    # quaternion round-trip on random rotations (all Shepperd branches)
    rs = np.random.RandomState(3)
    for _ in range(20):
        A = rs.randn(3, 3)
        Q, _r = np.linalg.qr(A)
        Q *= np.sign(np.linalg.det(Q))
        w, x, y, z = quat_from_rotation(Q)
        R_b = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R_b, Q, atol=1e-10)
