"""Tests for the synthetic nested-glass scene generator."""

import json
import os

import numpy as np

from nunerf_tpu.tools.synth_nested import (
    IOR, R_OUTER, _fresnel, _refract, gt_surface_points, make_nested_scene,
    trace_rays)


def test_fresnel_normal_incidence():
    # R = ((n1-n2)/(n1+n2))^2 = (0.5/2.5)^2 = 0.04 at normal incidence
    r = _fresnel(np.array([1.0]), 1.0, 1.5)
    assert np.allclose(r, 0.04, atol=1e-6)
    # grazing incidence -> 1
    r = _fresnel(np.array([0.0]), 1.0, 1.5)
    assert np.allclose(r, 1.0, atol=1e-6)


def test_refract_snell():
    d = np.array([[0.0, np.sin(0.5), -np.cos(0.5)]])
    n = np.array([[0.0, 0.0, 1.0]])
    out, tir = _refract(d, n, 1.0 / IOR)
    assert not tir[0]
    sin_t = np.abs(out[0, 1])
    assert np.allclose(sin_t, np.sin(0.5) / IOR, atol=1e-9)
    # TIR: inside glass beyond critical angle
    theta = np.arcsin(1.0 / IOR) + 0.1
    d = np.array([[0.0, np.sin(theta), -np.cos(theta)]])
    out, tir = _refract(d, n, IOR)
    assert tir[0]
    assert np.allclose(out[0, 1], d[0, 1])  # reflected keeps tangential comp


def test_trace_rays_energy_and_masks():
    rs = np.random.RandomState(0)
    o = np.tile(np.array([[0.0, 0.0, 2.0]]), (256, 1))
    d = rs.randn(256, 3)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb, hit = trace_rays(o, d)
    assert rgb.shape == (256, 3)
    assert np.isfinite(rgb).all()
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # central ray passes through the ball
    rgb_c, hit_c = trace_rays(np.array([[0.0, 0.0, 2.0]]),
                              np.array([[0.0, 0.0, -1.0]]))
    assert hit_c[0]


def test_gt_points_on_surfaces():
    outer, inner = gt_surface_points(2000)
    assert np.allclose(np.linalg.norm(outer, axis=-1), R_OUTER, atol=1e-5)
    # inner points lie inside the ball, outside none of the union members
    assert (np.linalg.norm(inner, axis=-1) < R_OUTER).all()


def test_make_nested_scene_dataset(tmp_path):
    root = make_nested_scene(str(tmp_path / "scene"), n_train=3, n_test=2,
                             h=24, w=24)
    meta = json.load(open(os.path.join(root, "transforms_train.json")))
    assert len(meta["frames"]) == 3
    assert os.path.exists(os.path.join(root, "train/r_0.png"))
    assert os.path.exists(os.path.join(root, "gt_outer.npy"))

    # consumable by the nerf database
    from nunerf_tpu.data.database import parse_database_name
    db = parse_database_name("nerf/scene", str(tmp_path))
    train_ids, test_ids = db.train_test_split()
    assert len(train_ids) == 3
    img = db.get_image(train_ids[0])
    assert img.shape == (24, 24, 3)
    mask = db.get_mask(train_ids[0])
    assert mask is not None and mask.max() > 0


def test_make_colmap_scene_real_path(tmp_path):
    """Capture-style scene -> CustomDatabase end-to-end: the database's
    up/forward alignment + object-cloud normalization + crop must recover a
    centered object, and the written GT surfaces must land where the
    normalized frame puts the glass."""
    from nunerf_tpu.tools.synth_nested import make_colmap_scene

    root = str(tmp_path / "nested_real")
    make_colmap_scene(root, n_views=4, h=60, w=80, shell=True)
    assert os.path.exists(os.path.join(root, "colmap/sparse/0/images.bin"))

    from nunerf_tpu.data.database import parse_database_name
    db = parse_database_name("custom/nested_real/48", str(tmp_path))
    ids = db.get_img_ids()
    assert len(ids) == 4
    # normalization: cloud inside the unit sphere, centered
    r = np.linalg.norm(db.ref_points, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    assert np.linalg.norm(db.ref_points.mean(0)) < 0.1
    # glass surface sits at ~0.8 in the normalized frame (noise halo sets
    # the scale); GT file must agree with the database's own normalization
    gt_outer = np.load(os.path.join(root, "gt_outer.npy"))
    # similarity transform: still a sphere about its own center (the bbox
    # normalization leaves a small off-origin offset, as on real captures)
    ctr = gt_outer.mean(0)
    r_gt = np.linalg.norm(gt_outer - ctr, axis=-1)
    np.testing.assert_allclose(r_gt, r_gt.mean(), atol=1e-2)
    assert 0.75 < r_gt.mean() < 0.85
    assert np.linalg.norm(ctr) < 0.05
    # database up-alignment: normalized world +z equals the capture up, so
    # the GT snowman axis (canonical +z) is +z again in the db frame
    gt_inner = np.load(os.path.join(root, "gt_inner.npy"))
    spread = gt_inner.max(0) - gt_inner.min(0)
    assert spread[2] > spread[0] and spread[2] > spread[1]

    # every center ray of the cropped views passes near the object center
    from nunerf_tpu.data.ray_store import build_imgs_info, construct_ray_batch
    info = build_imgs_info(db, ids, with_mask=True)
    batch, h, w = construct_ray_batch(info)
    ci = (h // 2) * w + w // 2
    for v in range(4):
        o = batch["rays_o"][v * h * w + ci]
        d = batch["rays_d"][v * h * w + ci]
        closest = o - np.dot(o, d) * d
        assert np.linalg.norm(closest) < 0.15
