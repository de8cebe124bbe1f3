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
