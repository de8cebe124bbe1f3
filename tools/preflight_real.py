"""CPU-mesh preflight of the full real-capture pipeline on a tiny scene:
synth --colmap -> stage-1 Trainer (NeRO rays, normal_ori) few steps ->
extract tiny mesh -> render-mask -> mask-erosion -> shell stage-2 Trainer
one step with masks.  Catches wiring bugs before TPU time is spent."""
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.tools.synth_nested import make_colmap_scene

    root = "/tmp/preflight"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    make_colmap_scene(f"{root}/datasets/tinyreal", n_views=6, h=50, w=66,
                      shell=True)

    s1_cfg = {
        "name": "tinyreal", "network": "shape",
        "database_name": "custom/tinyreal/48",
        "shader_config": {"sphere_direction": True, "human_light": False,
                          "light_exp_max": 5.0},
        "apply_occ_loss": True, "occ_loss_step": 2, "get_mask": False,
        "is_nerf": False, "zero_thickness": False,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ",
                 "outer_reg", "normal_ori"],
        "val_metric": ["shape_render"], "key_metric_name": "psnr",
        "train_dataset_type": "dummy", "dataset_dir": f"{root}/datasets",
        "model_dir": f"{root}/model",
        "n_samples": 12, "n_bg_samples": 6, "n_importance": 8,
        "up_sample_steps": 2, "train_ray_num": 64, "test_ray_num": 64,
        "total_step": 4, "val_interval": 4, "save_interval": 2,
        "train_log_step": 2, "scan_chunk": 2, "downsample_ratio": 1.0,
        "lr_cfg": {"end_warm": 2, "end_iter": 4},
        "compilation_cache_dir": "",
    }
    from nunerf_tpu.train.trainer import Trainer
    tr = Trainer(s1_cfg)
    tr.run()
    print("stage-1 preflight train OK")

    # tiny outer mesh from the (barely trained) SDF — just for the pipeline
    from nunerf_tpu.tracing.mesh_ops import extract_geometry, save_ply
    from nunerf_tpu.train.trainer import load_checkpoint
    _, params, _, _ = load_checkpoint(f"{root}/model/tinyreal/model.ckpt")

    def sdf_fn(pts):
        out = []
        for i in range(0, len(pts), 65536):
            out.append(np.asarray(
                tr.renderer.sdf(params, pts[i:i + 65536])[..., 0]))
        return np.concatenate(out)

    verts, tris = extract_geometry(sdf_fn, resolution=48, bound=1.0,
                                   threshold=0.0, outside_val=1.0)
    os.makedirs(f"{root}/meshes", exist_ok=True)
    mesh_path = f"{root}/meshes/tinyreal.ply"
    save_ply(mesh_path, verts, tris)
    print(f"extracted {len(verts)} verts {len(tris)} tris")
    assert len(tris) > 0

    from nunerf_tpu.tools.render_mask import erode_masks, render_masks
    render_masks(s1_cfg, mesh_path, chunk=4096)
    erode_masks(s1_cfg, erosion=3)

    s2_cfg = {
        "name": "tinyreal_s2", "network": "stage2",
        "database_name": "custom/tinyreal/48",
        "shader_config": {"sphere_direction": True, "human_light": False},
        "is_nerf": False, "get_mask": True, "zero_thickness": False,
        "loss": ["eikonal", "std", "nerf_render"],
        "val_metric": ["stage2"], "key_metric_name": "psnr",
        "train_dataset_type": "dummy", "dataset_dir": f"{root}/datasets",
        "model_dir": f"{root}/model",
        "stage1_mesh_dir": mesh_path,
        "stage1_ckpt_dir": f"{root}/model/tinyreal/model.ckpt",
        "stage1_cfg": {k: s1_cfg[k] for k in
                       ("shader_config", "is_nerf", "n_samples",
                        "n_bg_samples", "n_importance", "up_sample_steps")},
        "n_samples_outer": 24, "n_bg_importance": 8, "n_samples_inner": 8,
        "inner_up_rounds": 1, "inner_up_each": 4,
        "train_ray_num": 32, "test_ray_num": 32,
        "total_step": 2, "val_interval": 2, "save_interval": 2,
        "train_log_step": 1, "scan_chunk": 1, "downsample_ratio": 1.0,
        "lr_cfg": {"end_warm": 1, "end_iter": 2},
        "compilation_cache_dir": "",
    }
    tr2 = Trainer(s2_cfg)
    # masks must actually be present in the ray store
    assert "masks" in jax.device_get(tr2.device_store), \
        "get_mask=True but no masks reached the device store"
    tr2.run()
    print("shell stage-2 preflight train OK (masks wired)")
    print("PREFLIGHT PASS")


if __name__ == "__main__":
    main()
