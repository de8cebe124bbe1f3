"""Command-line entry points.

Mirrors the reference scripts: ``run_training.py``, ``extract_mesh_stage1.py``,
``extract_mesh_stage2.py``, ``render_mask.py``, ``mask_erosion.py``,
``postprocess_stage2_mesh.py``, ``relight.py`` — unified as subcommands:

    python -m nunerf_tpu.cli train --cfg configs/shape/nerf/spherepot.yaml
    python -m nunerf_tpu.cli extract-mesh-stage1 --cfg ... --resolution 1024
    python -m nunerf_tpu.cli extract-mesh-stage2 --cfg ... --resolution 256
    python -m nunerf_tpu.cli render-mask --cfg ... --mesh_path mesh.ply
    python -m nunerf_tpu.cli mask-erosion --cfg ... [--erosion 15]
    python -m nunerf_tpu.cli postprocess-stage2 --input in.ply --outer outer.ply
    python -m nunerf_tpu.cli relight --cfg ... --mesh mesh.ply
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def cmd_train(args):
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.train.trainer import Trainer

    cfg = load_cfg(args.cfg)
    # zero_thickness selects the trainer pair in the reference
    # (run_training.py:16-20); here both modes share one Trainer.
    trainer = Trainer(cfg)
    trainer.run()


def cmd_extract_mesh_stage1(args):
    """extract_mesh_stage1.py:15-59: marching cubes on the stage-1 SDF."""
    import jax
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.trainer import load_checkpoint
    from nunerf_tpu.tracing.mesh_ops import extract_geometry, save_ply, isotropic_remesh

    cfg = load_cfg(args.cfg)
    renderer = ShapeRenderer(cfg)
    name = cfg["name"]
    ckpt = args.ckpt or os.path.join("data/model", name, "model.ckpt")
    step, params, _, _ = load_checkpoint(ckpt)

    def sdf_fn(pts, chunk=2 ** 21):
        # extraction slabs reach 33.5M points at res 512 — chunk the device
        # calls so activations stay within HBM
        out = [np.asarray(renderer.sdf(params, pts[i:i + chunk])[..., 0])
               for i in range(0, len(pts), chunk)]
        return np.concatenate(out, 0)

    verts, tris = extract_geometry(sdf_fn, resolution=args.resolution,
                                   bound=1.0, threshold=0.0, outside_val=1.0)
    os.makedirs("data/meshes", exist_ok=True)
    tag = f"_{args.tag}" if getattr(args, "tag", None) else ""
    out = f"data/meshes/{name}-{step}{tag}.ply"
    # The reference flips faces before export (extract_mesh_stage1.py:44)
    # because PyMCubes winds them inward for its SDF convention; our
    # marching-tets extraction already yields OUTWARD-wound faces
    # (tests/test_tracing.py::test_mesh_face_orientation), so flipping here
    # would invert every vertex normal the stage-2 refraction relies on.
    save_ply(out, verts, tris)
    verts_s, tris_s = isotropic_remesh(verts, tris)
    save_ply(f"data/meshes/{name}-{step}{tag}_simplified.ply", verts_s, tris_s)
    print(f"wrote {out} ({verts.shape[0]} verts) + simplified")


def cmd_extract_mesh_stage2(args):
    """extract_mesh_stage2.py:39-58: inner SDF where outer SDF < 0."""
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models import build_renderer
    from nunerf_tpu.train.trainer import load_checkpoint
    from nunerf_tpu.tracing.mesh_ops import extract_geometry, save_ply

    cfg = load_cfg(args.cfg)
    renderer = build_renderer(cfg)  # zero-thickness or curvature-shell
    name = cfg["name"]
    ckpt = args.ckpt or os.path.join("data/model", name, "model.ckpt")
    step, params, _, _ = load_checkpoint(ckpt)

    def sdf_fn(pts, chunk=2 ** 21):
        out = []
        for i in range(0, len(pts), chunk):
            p = pts[i:i + chunk]
            inner = np.asarray(renderer.inner_sdf(params, p)[..., 0])
            outer = np.asarray(renderer.stage1_sdf(p)[..., 0])
            out.append(np.where(outer < 0, inner, 1.0))
        return np.concatenate(out, 0)

    verts, tris = extract_geometry(sdf_fn, resolution=args.resolution,
                                   bound=1.0, threshold=0.0, outside_val=1.0)
    os.makedirs("data/meshes", exist_ok=True)
    out = f"data/meshes/{name}-{step}-inner.ply"
    save_ply(out, verts, tris)  # extraction winds outward (see stage-1 note)
    print(f"wrote {out} ({verts.shape[0]} verts)")


def cmd_render_mask(args):
    """render_mask.py: rasterize outer-mesh hit masks for every train view."""
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.tools.render_mask import render_masks

    cfg = load_cfg(args.cfg)
    render_masks(cfg, args.mesh_path)


def cmd_mask_erosion(args):
    """mask_erosion.py:29-35: erode + inverted-original union."""
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.tools.render_mask import erode_masks

    cfg = load_cfg(args.cfg)
    erode_masks(cfg, erosion=args.erosion)


def cmd_postprocess_stage2(args):
    """postprocess_stage2_mesh.py:9-26: drop inner faces near the outer mesh."""
    from nunerf_tpu.tracing.mesh_ops import load_ply, save_ply
    from nunerf_tpu.tracing.scene import Scene

    verts, tris = load_ply(args.input)
    outer = Scene(args.outer)
    centers = verts[tris].mean(1)
    d = outer.unsigned_distance(centers)
    keep = d > args.threshold
    tris = tris[keep]
    n_dist = len(tris)
    if getattr(args, "largest_component", False):
        # round-5 option (net-new vs the reference's distance-only filter):
        # a scheduled inv_s floor hardens residual NeuS fog into thin junk
        # shells that survive the distance filter; they are disconnected
        # from the inner object, so keep only the largest face-connected
        # component
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csg
        f = np.arange(len(tris))
        rows = np.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]])
        cols = np.concatenate([f, f, f])
        m = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                          shape=(len(verts), len(tris)))
        # faces sharing a vertex are connected: components of (F x F) graph
        _, labels = csg.connected_components((m.T @ m) > 0, directed=False)
        largest = np.bincount(labels).argmax()
        tris = tris[labels == largest]
    save_ply(args.output or args.input.replace(".ply", "_post.ply"),
             verts, tris)
    print(f"kept {len(tris)}/{len(keep)} faces"
          + (f" (distance filter: {n_dist})"
             if getattr(args, "largest_component", False) else ""))


def cmd_postprocess_outer(args):
    """Keep only the outside-visible surface of a stage-1 mesh — hollow-glass
    scenes also march interior junk (the inner object is photometrically
    attractive through thin glass); stage-2 requires the OUTER surface
    (see nunerf_tpu/tools/outer_filter.py)."""
    from nunerf_tpu.tools.outer_filter import filter_outer
    from nunerf_tpu.tracing.mesh_ops import load_ply, save_ply

    verts, tris = load_ply(args.input)
    v2, t2, stats = filter_outer(verts, tris, n_views=args.views,
                                 radius=args.radius)
    if args.smooth > 0:
        from nunerf_tpu.tools.outer_filter import taubin_smooth
        v2 = taubin_smooth(v2, t2, iters=args.smooth)
        stats["smooth_iters"] = args.smooth
    out = args.output or args.input.replace(".ply", "_outer.ply")
    save_ply(out, v2, t2)
    print(f"outer filter: {stats} -> {out}")


def cmd_hull_mesh(args):
    """Convex hull of a mesh's vertices — the round-5 bootstrap mask prior
    (see nunerf_tpu/tools/outer_filter.py convex_hull_mesh): render-mask on
    the hull recovers the full container silhouette from a fragmentary
    first-pass reconstruction."""
    from nunerf_tpu.tools.outer_filter import convex_hull_mesh
    from nunerf_tpu.tracing.mesh_ops import load_ply, save_ply

    verts, _ = load_ply(args.input)
    hv, ht = convex_hull_mesh(verts)
    out = args.output or args.input.replace(".ply", "_hull.ply")
    save_ply(out, hv, ht)
    print(f"hull: {len(verts)} verts -> {len(hv)} verts / {len(ht)} faces"
          f" -> {out}")


def cmd_silhouette_prior(args):
    """Bootstrap silhouette prior for real captures (round 5): convex hull
    of the density-filtered COLMAP object cloud (the same
    object_point_cloud.ply the database normalizes with,
    reference database.py:387-391).  render-mask on the result gives the
    container silhouette an unmasked first stage-1 pass cannot recover
    (transparent outers dissolve; measured 49% GT silhouette coverage from
    the pass-1 mesh vs 99.7% IoU from this prior on the synthetic capture)."""
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.data.database import parse_database_name
    from nunerf_tpu.tools.outer_filter import density_filtered_hull
    from nunerf_tpu.tracing.mesh_ops import save_ply

    cfg = load_cfg(args.cfg)
    db = parse_database_name(cfg["database_name"], cfg["dataset_dir"])
    if not hasattr(db, "ref_points"):
        raise SystemExit("silhouette-prior needs a COLMAP-style database "
                         "with an object point cloud")
    hv, ht = density_filtered_hull(db.ref_points, k=args.knn,
                                   thresh=args.thresh)
    out = args.output or os.path.join(
        "data/meshes", f"{cfg['name']}_silhouette.ply")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_ply(out, hv, ht)
    print(f"silhouette prior: {len(db.ref_points)} cloud pts -> hull "
          f"{len(hv)} verts / {len(ht)} faces -> {out}")


def cmd_relight(args):
    """relight.py: export per-vertex materials (+ optional blender driver)."""
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.trainer import load_checkpoint
    from nunerf_tpu.tracing.mesh_ops import load_ply

    cfg = load_cfg(args.cfg)
    renderer = ShapeRenderer(cfg)
    step, params, _, _ = load_checkpoint(args.ckpt)
    verts, _ = load_ply(args.mesh)

    import jax.numpy as jnp
    out = {"metallic": [], "roughness": [], "albedo": []}
    for i in range(0, len(verts), 8192):
        chunk = jnp.asarray(verts[i:i + 8192], jnp.float32)
        feats = renderer.sdf_net.apply(params["sdf"], chunk)[:, 1:]
        m, r, a = renderer.color_net.apply(
            params["shade"], chunk, feats,
            method=type(renderer.color_net).predict_materials)
        out["metallic"].append(np.asarray(m))
        out["roughness"].append(np.asarray(r))
        out["albedo"].append(np.asarray(a))
    os.makedirs(args.output, exist_ok=True)
    for k, v in out.items():
        np.save(os.path.join(args.output, f"{k}.npy"), np.concatenate(v, 0))
    print(f"materials written to {args.output}")


def cmd_eval_geometry(args):
    """Geometry evaluation: chamfer distance between meshes (the reference
    ships a CUDA chamfer extension for this, chamfer_distance/)."""
    import numpy as np
    from nunerf_tpu.ops.chamfer import chamfer_distance
    from nunerf_tpu.tracing.mesh_ops import load_ply

    def sample_surface(path, n):
        if path.endswith(".npy"):
            pts = np.load(path).astype(np.float32)
            rs = np.random.RandomState(0)
            return pts[rs.choice(len(pts), min(n, len(pts)), replace=False)]
        verts, tris = load_ply(path)
        if len(tris) == 0:
            return np.zeros((0, 3), np.float32)
        v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
        p = area / max(area.sum(), 1e-12)
        rs = np.random.RandomState(0)
        fi = rs.choice(len(tris), n, p=p)
        u, v = rs.rand(n, 1), rs.rand(n, 1)
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u)
        v = np.where(flip, 1 - v, v)
        return (v0[fi] + u * (v1[fi] - v0[fi]) + v * (v2[fi] - v0[fi]))

    import json
    a = sample_surface(args.mesh, args.n_samples)
    b = sample_surface(args.gt, args.n_samples)
    if len(a) == 0 or len(b) == 0:
        # an empty mesh (e.g. postprocess dropped every face) is a result,
        # not a crash — report it so unattended pipeline runs keep going
        print(json.dumps({"chamfer": None, "pred_to_gt": None,
                          "gt_to_pred": None,
                          "error": f"empty surface: pred={len(a)} gt={len(b)}"}))
        return
    d1, d2 = chamfer_distance(a, b)
    print(json.dumps({"chamfer": float(d1) + float(d2),
                      "pred_to_gt": float(d1), "gt_to_pred": float(d2)}))


def cmd_eval_images(args):
    """Full test-split evaluation: render EVERY view of the chosen split
    and emit a per-view PSNR/SSIM table + means (JSON alongside).

    Reference: the fixed eval split (``configs/synthetic_split_128.pkl`` /
    blender test frames, dataset/database.py:667-679) evaluated per-view by
    ``train/train_valid.py:19-53``.
    """
    import json

    import jax
    import numpy as np
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.data.database import get_database_split
    from nunerf_tpu.data.ray_store import build_imgs_info
    from nunerf_tpu.parallel.mesh import replicate
    from nunerf_tpu.train.metrics import compute_psnr, compute_ssim
    from nunerf_tpu.train.trainer import Trainer, load_checkpoint

    cfg = load_cfg(args.cfg)
    trainer = Trainer(cfg)
    name = cfg["name"]
    ckpt = args.ckpt or os.path.join("data/model", name, "model_best.ckpt")
    step = 0
    if os.path.exists(ckpt):
        step, params, _, _ = load_checkpoint(ckpt)
        trainer.params = replicate(params, trainer.mesh)
    else:
        print(f"WARNING: no checkpoint at {ckpt}; evaluating the init")

    split_db = trainer.database
    if args.split == "test" and cfg["database_name"].startswith("nerf/"):
        # blender scenes: the training database keeps every testskip-th test
        # frame (database.py:612 semantics); full evaluation reloads the
        # test transforms with no skip (the reference's database_eval role)
        from nunerf_tpu.data.database import NeRFSyntheticDatabase
        split_db = NeRFSyntheticDatabase(
            cfg["database_name"], cfg.get("dataset_dir", "./datasets"),
            testskip=1)
        _, test_ids = split_db.train_test_split()
    else:
        _, test_ids = get_database_split(split_db, args.split)
    rng = jax.random.PRNGKey(0)
    rows = []
    for vid in test_ids:
        info = build_imgs_info(split_db, [vid], with_mask=True)
        outputs, h, w = trainer.render_image(info, step, rng)
        gt, pr = outputs["gt_rgb"], outputs["ray_rgb"]
        if "tir_mask" in outputs:
            # stage-2 scores TIR-masked pixels out of both images
            # (reference test_step, renderer_zerothick.py:1248-1250)
            tm = outputs["tir_mask"].reshape(-1, 1)
            gt, pr = gt * tm, pr * tm
        psnr = float(compute_psnr(gt, pr))
        ssim = float(compute_ssim(gt.reshape(h, w, 3), pr.reshape(h, w, 3)))
        rows.append({"view": str(vid), "psnr": psnr, "ssim": ssim})
        print(f"view {vid:>6}  psnr {psnr:7.3f}  ssim {ssim:.4f}")

    mean_psnr = float(np.mean([r["psnr"] for r in rows]))
    mean_ssim = float(np.mean([r["ssim"] for r in rows]))
    print(f"split '{args.split}' ({len(rows)} views)  "
          f"mean psnr {mean_psnr:.3f}  mean ssim {mean_ssim:.4f}")
    out_dir = os.path.join("data", "eval", name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"eval_{args.split}.json")
    with open(path, "w") as f:
        json.dump({"step": int(step), "split": args.split, "views": rows,
                   "mean_psnr": mean_psnr, "mean_ssim": mean_ssim}, f,
                  indent=1)
    print(f"wrote {path}")


def cmd_render_orbit(args):
    """Headless novel-view orbit rendering — the capability of the
    reference's interactive dearpygui viewer (raytracing/renderer.py:195-443)
    as a batch tool: render n views on a circular orbit and write PNGs."""
    import cv2
    import jax
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.trainer import load_checkpoint
    from nunerf_tpu.tools.synth_nested import _look_at

    cfg = load_cfg(args.cfg)
    renderer = ShapeRenderer(cfg)
    name = cfg["name"]
    ckpt = args.ckpt or os.path.join("data/model", name, "model_best.ckpt")
    step, params, _, _ = load_checkpoint(ckpt)
    params = jax.device_put(params)

    h = w = args.size
    focal = 0.5 * w / np.tan(0.5 * args.fov)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    os.makedirs(args.output, exist_ok=True)
    for k in range(args.n_views):
        phi = 2 * np.pi * k / args.n_views
        pos = args.radius * np.array([
            np.cos(phi) * np.cos(args.elevation),
            np.sin(phi) * np.cos(args.elevation), np.sin(args.elevation)])
        c2w = _look_at(pos)  # OpenGL cam->world
        # nvs expects OpenCV world->cam [3,4]: flip y/z axes, then invert
        R = (c2w[:3, :3] @ np.diag([1.0, -1.0, -1.0])).T
        t = -R @ c2w[:3, 3]
        pose = np.concatenate([R, t[:, None]], -1).astype(np.float32)
        img = renderer.nvs(params, pose, K, h, w, step=step)
        cv2.imwrite(os.path.join(args.output, f"orbit_{k:03d}.png"),
                    (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8))
    print(f"wrote {args.n_views} views to {args.output}")


def cmd_synth_scene(args):
    """Generate the synthetic nested-glass validation scene (no external
    data needed; the reference's scenes live on an external drive link)."""
    if args.colmap:
        from nunerf_tpu.tools.synth_nested import make_colmap_scene
        root = make_colmap_scene(args.output, n_views=args.n_train,
                                 shell=args.shell)
    else:
        from nunerf_tpu.tools.synth_nested import make_nested_scene
        root = make_nested_scene(args.output, n_train=args.n_train,
                                 n_test=args.n_test, h=args.size, w=args.size,
                                 shell=args.shell)
    print(f"wrote nested-glass scene to {root}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="nunerf_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("train")
    sp.add_argument("--cfg", required=True)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("extract-mesh-stage1")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--resolution", type=int, default=1024)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--tag", default=None,
                    help="suffix for the output mesh name (keeps a res-1024 "
                         "extraction from clobbering the training mesh)")
    sp.set_defaults(fn=cmd_extract_mesh_stage1)

    sp = sub.add_parser("extract-mesh-stage2")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--resolution", type=int, default=256)
    sp.add_argument("--ckpt", default=None)
    sp.set_defaults(fn=cmd_extract_mesh_stage2)

    sp = sub.add_parser("render-mask")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--mesh_path", required=True)
    sp.set_defaults(fn=cmd_render_mask)

    sp = sub.add_parser("mask-erosion")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--erosion", type=int, default=15)
    sp.set_defaults(fn=cmd_mask_erosion)

    sp = sub.add_parser("postprocess-stage2")
    sp.add_argument("--input", required=True)
    sp.add_argument("--outer", required=True)
    sp.add_argument("--output", default=None)
    sp.add_argument("--threshold", type=float, default=0.055)
    sp.add_argument("--largest-component", action="store_true",
                    help="additionally keep only the largest face-connected "
                         "component (drops inv_s-floor fog shells)")
    sp.set_defaults(fn=cmd_postprocess_stage2)

    sp = sub.add_parser("hull-mesh")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default=None)
    sp.set_defaults(fn=cmd_hull_mesh)

    sp = sub.add_parser("silhouette-prior")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--output", default=None)
    sp.add_argument("--knn", type=int, default=5)
    sp.add_argument("--thresh", type=float, default=2.0)
    sp.set_defaults(fn=cmd_silhouette_prior)

    sp = sub.add_parser("postprocess-outer")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default=None)
    sp.add_argument("--views", type=int, default=64)
    sp.add_argument("--radius", type=float, default=2.0)
    sp.add_argument("--smooth", type=int, default=0,
                    help="Taubin smoothing iterations on the filtered mesh")
    sp.set_defaults(fn=cmd_postprocess_outer)

    sp = sub.add_parser("eval-geometry")
    sp.add_argument("--mesh", required=True)
    sp.add_argument("--gt", required=True)
    sp.add_argument("--n-samples", type=int, default=100000)
    sp.set_defaults(fn=cmd_eval_geometry)

    sp = sub.add_parser("eval-images")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--split", default="validation",
                    choices=["validation", "test"],
                    help="which split to evaluate every view of "
                         "(reference: dataset/database.py:667-679)")
    sp.set_defaults(fn=cmd_eval_images)

    sp = sub.add_parser("render-orbit")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--output", default="data/orbit")
    sp.add_argument("--n-views", type=int, default=12)
    sp.add_argument("--size", type=int, default=256)
    sp.add_argument("--radius", type=float, default=2.2)
    sp.add_argument("--elevation", type=float, default=0.4)
    sp.add_argument("--fov", type=float, default=0.65)
    sp.set_defaults(fn=cmd_render_orbit)

    sp = sub.add_parser("synth-scene")
    sp.add_argument("--output", default="./datasets/nested")
    sp.add_argument("--n-train", type=int, default=48)
    sp.add_argument("--n-test", type=int, default=8)
    sp.add_argument("--size", type=int, default=128)
    sp.add_argument("--shell", action="store_true",
                    help="hollow-glass (thick shell) variant")
    sp.add_argument("--colmap", action="store_true",
                    help="capture-style layout: COLMAP model + full frames "
                         "+ object point cloud (CustomDatabase, real path)")
    sp.set_defaults(fn=cmd_synth_scene)

    sp = sub.add_parser("relight")
    sp.add_argument("--cfg", required=True)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--mesh", required=True)
    sp.add_argument("--output", default="data/materials")
    sp.set_defaults(fn=cmd_relight)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
