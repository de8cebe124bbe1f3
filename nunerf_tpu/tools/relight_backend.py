"""Headless-Blender relighting backend.

Equivalent of the reference's ``blender_backend/relight_backend.py:15-110``:
load the reconstructed mesh, attach the exported per-vertex materials
(metallic / roughness / albedo from ``cli.py relight``) to a Principled BSDF,
light with an environment HDR, and render turntable views.

Run inside Blender (not importable in a normal Python env):

    blender --background --python relight_backend.py -- \
        --mesh mesh.ply --materials data/materials --hdr env.hdr --out out/
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    import bpy  # only available inside Blender
    import numpy as np

    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", required=True)
    p.add_argument("--materials", required=True)
    p.add_argument("--hdr", required=True)
    p.add_argument("--out", default="relight_out")
    p.add_argument("--n-views", type=int, default=8)
    p.add_argument("--resolution", type=int, default=800)
    args = p.parse_args(argv)

    # clean scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution

    # environment light
    world = bpy.data.worlds.new("world")
    scene.world = world
    world.use_nodes = True
    nt = world.node_tree
    env = nt.nodes.new("ShaderNodeTexEnvironment")
    env.image = bpy.data.images.load(args.hdr)
    nt.links.new(env.outputs["Color"],
                 nt.nodes["Background"].inputs["Color"])

    # mesh + per-vertex materials as color attributes
    bpy.ops.wm.ply_import(filepath=args.mesh)
    obj = bpy.context.selected_objects[0]
    mesh = obj.data

    metallic = np.load(os.path.join(args.materials, "metallic.npy"))[:, 0]
    roughness = np.load(os.path.join(args.materials, "roughness.npy"))[:, 0]
    albedo = np.load(os.path.join(args.materials, "albedo.npy"))

    def add_attr(name, data, size):
        attr = mesh.color_attributes.new(name=name, type="FLOAT_COLOR",
                                         domain="POINT")
        rgba = np.ones((len(mesh.vertices), 4), np.float32)
        rgba[:, :size] = data.reshape(len(mesh.vertices), size)
        attr.data.foreach_set("color", rgba.reshape(-1))

    add_attr("albedo", albedo, 3)
    add_attr("metallic", np.stack([metallic] * 3, -1), 3)
    add_attr("roughness", np.stack([roughness] * 3, -1), 3)

    mat = bpy.data.materials.new("recon")
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    for attr_name, socket in (("albedo", "Base Color"),
                              ("metallic", "Metallic"),
                              ("roughness", "Roughness")):
        node = mat.node_tree.nodes.new("ShaderNodeVertexColor")
        node.layer_name = attr_name
        mat.node_tree.links.new(node.outputs["Color"], bsdf.inputs[socket])
    obj.data.materials.append(mat)

    # turntable camera
    cam_data = bpy.data.cameras.new("cam")
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam

    os.makedirs(args.out, exist_ok=True)
    import math
    for i in range(args.n_views):
        ang = 2 * math.pi * i / args.n_views
        cam.location = (2.5 * math.cos(ang), 2.5 * math.sin(ang), 0.8)
        direction = -np.array(cam.location)
        rot = np.arctan2(direction[1], direction[0])
        cam.rotation_euler = (math.radians(72), 0, rot + math.pi / 2)
        scene.render.filepath = os.path.join(args.out, f"view_{i:03d}.png")
        bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
