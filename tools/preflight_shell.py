"""CPU-mesh preflight of the nested_shell (hollow-glass) pipeline legs that
preflight_real does not cover: blender-convention --shell scene -> stage-1 a
few steps -> tiny outer mesh -> curvature-shell stage-2 a few steps ->
stage-2 inner-mesh extraction path -> eval_shell scoring of the learned
IoR/thickness fields.  Catches wiring bugs before TPU time is spent."""
import json
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    from nunerf_tpu.tools.synth_nested import make_nested_scene

    root = "/tmp/preflight_shell"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    make_nested_scene(f"{root}/datasets/tinyshell", n_train=6, n_test=2,
                      h=50, w=50, shell=True)

    s1_cfg = {
        "name": "tinyshell", "network": "shape",
        "database_name": "nerf/tinyshell",
        "apply_occ_loss": True, "occ_loss_step": 2, "get_mask": False,
        "is_nerf": True, "zero_thickness": True,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ",
                 "mask", "outer_reg"],
        "val_metric": ["shape_render"], "key_metric_name": "psnr",
        "train_dataset_type": "dummy", "dataset_dir": f"{root}/datasets",
        "model_dir": f"{root}/model",
        "n_samples": 12, "n_bg_samples": 6, "n_importance": 8,
        "up_sample_steps": 2, "train_ray_num": 64, "test_ray_num": 64,
        "total_step": 4, "val_interval": 4, "save_interval": 2,
        "train_log_step": 2, "scan_chunk": 2, "downsample_ratio": 1.0,
        # near-zero lr: this is a WIRING preflight — keep the geometric-init
        # sphere intact so the extraction step below has a surface to find
        # (4 real adam steps measurably shift the whole SDF)
        "lr_cfg": {"end_warm": 4000, "end_iter": 8000},
        "compilation_cache_dir": "",
    }
    from nunerf_tpu.train.trainer import Trainer
    Trainer(s1_cfg).run()
    print("shell stage-1 preflight train OK")

    from nunerf_tpu.tracing.mesh_ops import extract_geometry, save_ply
    from nunerf_tpu.train.trainer import load_checkpoint
    from nunerf_tpu.models import build_renderer
    _, params, _, _ = load_checkpoint(f"{root}/model/tinyshell/model.ckpt")
    r1 = build_renderer(s1_cfg)

    def sdf_fn(pts):
        return np.asarray(r1.sdf(params, pts)[..., 0])

    verts, tris = extract_geometry(sdf_fn, resolution=48, bound=1.0,
                                   threshold=0.0, outside_val=1.0)
    mesh_path = f"{root}/tinyshell.ply"
    save_ply(mesh_path, verts, tris)
    assert len(tris) > 0
    print(f"extracted {len(verts)} verts")

    s2_cfg = {
        "name": "tinyshell_s2", "network": "stage2",
        "database_name": "nerf/tinyshell",
        "shader_config": {"sphere_direction": False, "human_light": False},
        "is_nerf": True, "get_mask": False, "zero_thickness": False,
        "loss": ["eikonal", "std", "nerf_render"],
        "val_metric": ["stage2"], "key_metric_name": "psnr",
        "train_dataset_type": "dummy", "dataset_dir": f"{root}/datasets",
        "model_dir": f"{root}/model",
        "stage1_mesh_dir": mesh_path,
        "stage1_ckpt_dir": f"{root}/model/tinyshell/model.ckpt",
        "stage1_cfg": {k: s1_cfg[k] for k in
                       ("is_nerf", "n_samples", "n_bg_samples",
                        "n_importance", "up_sample_steps")},
        "n_samples_outer": 24, "n_bg_importance": 8, "n_samples_inner": 8,
        "inner_up_rounds": 1, "inner_up_each": 4,
        "train_ray_num": 32, "test_ray_num": 32,
        "total_step": 2, "val_interval": 2, "save_interval": 2,
        "train_log_step": 1, "scan_chunk": 1, "downsample_ratio": 1.0,
        "lr_cfg": {"end_warm": 1, "end_iter": 2},
        "compilation_cache_dir": "",
    }
    Trainer(s2_cfg).run()
    print("shell stage-2 preflight train OK")

    # stage-2 inner-extraction path (cli.cmd_extract_mesh_stage2 core)
    r2 = build_renderer(s2_cfg)
    _, p2, _, _ = load_checkpoint(f"{root}/model/tinyshell_s2/model.ckpt")

    def sdf2(pts):
        inner = np.asarray(r2.inner_sdf(p2, pts)[..., 0])
        outer = np.asarray(r2.stage1_sdf(pts)[..., 0])
        return np.where(outer < 0, inner, 1.0)

    v2, t2 = extract_geometry(sdf2, resolution=32, bound=1.0,
                              threshold=0.0, outside_val=1.0)
    print(f"inner extraction OK ({len(v2)} verts)")

    # eval_shell scoring path (import and call its core on this ckpt)
    import yaml
    cfg_path = f"{root}/tinyshell_s2.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(s2_cfg, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    res = subprocess.run(
        [sys.executable, "tools/eval_shell.py", "--cfg", cfg_path,
         "--meta", f"{root}/datasets/tinyshell/meta.json",
         "--ckpt", f"{root}/model/tinyshell_s2/model.ckpt"],
        capture_output=True, text=True, env=env)
    print(res.stdout.strip()[-300:])
    assert res.returncode == 0, res.stderr[-2000:]
    print("PREFLIGHT SHELL PASS")


if __name__ == "__main__":
    main()
