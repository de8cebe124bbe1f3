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

    # all three material attributes attached, one RGBA per vertex
    for name in ("albedo", "metallic", "roughness"):
        assert attrs[name]["color"].shape == (nv * 4,)
        assert np.isfinite(attrs[name]["color"]).all()
    # albedo channel round-trips into the vertex-color attribute
    a = np.load(os.path.join(out, "albedo.npy"))
    np.testing.assert_allclose(
        attrs["albedo"]["color"].reshape(nv, 4)[:, :3], a, rtol=1e-6)
    # turntable rendered every requested view
    assert len(rendered) == 3
    assert all(os.path.exists(p) for p in rendered)
