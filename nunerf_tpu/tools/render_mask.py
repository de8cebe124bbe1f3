"""Mask pipeline: render outer-mesh hit masks for every train view + erosion.

Reference: ``render_mask.py`` -> ``utils/render_mask_synthetic.py:10-76`` /
``render_mask_real.py`` (per-view full-res ray grid -> Scene hit -> {0,255}
JPEG), then ``mask_erosion.py:29-35`` (erode 15 px, union with the inverted
original).  The eroded masks land in ``<scene>/mask_erosion/`` where the
databases pick them up (dataset/database.py:579-583).
"""

from __future__ import annotations

import os

import cv2
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.config import merge_cfg, STAGE1_DEFAULTS
from nunerf_tpu.data.database import parse_database_name
from nunerf_tpu.data.ray_store import (build_imgs_info, construct_nerf_ray_batch,
                                       construct_ray_batch)
from nunerf_tpu.tracing.scene import Scene


def render_masks(cfg: dict, mesh_path: str, chunk: int = 8192):
    cfg = merge_cfg(STAGE1_DEFAULTS, cfg)
    db = parse_database_name(cfg["database_name"], cfg["dataset_dir"])
    scene = Scene(mesh_path)
    img_ids = db.get_img_ids()
    out_dir = os.path.join(db.root, "mask")
    os.makedirs(out_dir, exist_ok=True)

    for img_id in img_ids:
        info = build_imgs_info(db, [img_id], with_mask=False)
        if cfg["is_nerf"]:
            batch, h, w = construct_nerf_ray_batch(info)
        else:
            batch, h, w = construct_ray_batch(info)
        hits = []
        for i0 in range(0, h * w, chunk):
            o = jnp.asarray(batch["rays_o"][i0:i0 + chunk])
            d = jnp.asarray(batch["rays_d"][i0:i0 + chunk])
            hits.append(np.asarray(scene.intersect(o, d).hit))
        mask = np.concatenate(hits).reshape(h, w).astype(np.uint8) * 255
        # mirror the image's relative path so database.get_mask finds the
        # eroded result at mask_erosion/<name>.jpg (reference writes
        # mask/<image_name minus ext>.jpg, render_mask_synthetic.py:76)
        rel = os.path.splitext(db.get_image_name(img_id))[0] + ".jpg"
        out_fp = os.path.normpath(os.path.join(out_dir, rel))
        os.makedirs(os.path.dirname(out_fp), exist_ok=True)
        cv2.imwrite(out_fp, mask)
    print(f"wrote {len(img_ids)} masks to {out_dir}")
    return out_dir


def erode_masks(cfg: dict, erosion: int = 15):
    """mask_erosion.py:29-35: keep the eroded interior plus everything the
    original mask excluded (the outer-boundary ring is dropped)."""
    cfg = merge_cfg(STAGE1_DEFAULTS, cfg)
    db = parse_database_name(cfg["database_name"], cfg["dataset_dir"])
    mask_dir = os.path.join(db.root, "mask")
    out_dir = os.path.join(db.root, "mask_erosion")
    os.makedirs(out_dir, exist_ok=True)
    kernel = np.ones((erosion, erosion), np.uint8)
    n = 0
    for dirpath, _, fnames in os.walk(mask_dir):
        for fname in sorted(fnames):
            fp = os.path.join(dirpath, fname)
            m = cv2.imread(fp, cv2.IMREAD_GRAYSCALE)
            if m is None:
                continue
            eroded = cv2.erode(m, kernel)
            out = np.clip(eroded.astype(np.int32) + (255 - m), 0,
                          255).astype(np.uint8)
            out_fp = os.path.join(out_dir, os.path.relpath(fp, mask_dir))
            os.makedirs(os.path.dirname(out_fp), exist_ok=True)
            cv2.imwrite(out_fp, out)
            n += 1
    print(f"wrote {n} eroded masks to {out_dir}")
    return out_dir
