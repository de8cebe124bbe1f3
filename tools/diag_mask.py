"""Diagnostic: how well do the rendered pass-1 masks cover the GT outer-ball
silhouette?  (Round-5 bootstrap gate: if the first-pass mesh dissolved, its
rendered silhouette under-covers the ball and a weight-0.5 acc target would
LOCK IN the dissolution.)

Uses the synthetic capture's analytic GT (meta.json r_outer — normalized
frame) purely as a diagnostic; the training loop never sees it.

Usage: python tools/diag_mask.py --cfg configs/shape/real/nested_real.yaml
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--mask-dir", default=None)
    args = ap.parse_args()

    import cv2

    from nunerf_tpu.config import STAGE1_DEFAULTS, load_cfg, merge_cfg
    from nunerf_tpu.data.database import parse_database_name
    from nunerf_tpu.data.ray_store import build_imgs_info, construct_ray_batch

    cfg = merge_cfg(STAGE1_DEFAULTS, load_cfg(args.cfg))
    db = parse_database_name(cfg["database_name"], cfg["dataset_dir"])
    meta = json.load(open(os.path.join(db.root, "meta.json")))
    r = meta["r_outer"]
    mask_dir = args.mask_dir or os.path.join(db.root, "mask")

    inter, union, gt_area, covered = 0, 0, 0, 0
    n_views = 0
    for img_id in db.get_img_ids():
        stem = os.path.splitext(db.get_image_name(img_id))[0]
        fps = glob.glob(os.path.join(mask_dir, stem + ".*"))
        if not fps:
            continue
        m = cv2.imread(fps[0], cv2.IMREAD_GRAYSCALE)
        if m is None:
            continue
        info = build_imgs_info(db, [img_id], with_mask=False)
        batch, h, w = construct_ray_batch(info)
        o, d = batch["rays_o"], batch["rays_d"]
        ob = np.sum(o * d, -1)
        disc = ob * ob - (np.sum(o * o, -1) - r * r)
        gt = (disc > 0) & (-ob - np.sqrt(np.maximum(disc, 0)) > 0)
        gt = gt.reshape(h, w)
        pr = m.reshape(h, w) > 127
        inter += int((gt & pr).sum())
        union += int((gt | pr).sum())
        gt_area += int(gt.sum())
        covered += int((gt & pr).sum())
        n_views += 1

    out = {"views": n_views, "iou": inter / max(union, 1),
           "gt_coverage": covered / max(gt_area, 1),
           "false_positive_frac": (union - gt_area) / max(gt_area, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
