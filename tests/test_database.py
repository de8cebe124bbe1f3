"""Data layer: COLMAP-backed databases, ray conventions, glossy-synthetic IO.

The blender database + nerf ray batch are covered by test_stage1; here the
COLMAP path (CustomDatabase end-to-end on a synthetic scene written with our
own colmap writer) and the NeRO-convention ray batch get direct coverage.
"""

import os
import pickle

import cv2
import numpy as np
import pytest

from nunerf_tpu.data.colmap import (Camera, Image, Point3D, rotmat_to_qvec,
                                    write_model)
from nunerf_tpu.data.database import (GlossySyntheticDatabase,
                                      parse_database_name,
                                      read_ply_points, write_ply_points)
from nunerf_tpu.data.ray_store import (build_imgs_info, construct_ray_batch,
                                       near_far_from_sphere)


def _look_at_w2c(cam_pos):
    """world->cam [3,4] for an OpenCV camera at cam_pos looking at origin."""
    z = -cam_pos / np.linalg.norm(cam_pos)  # +z = viewing direction
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    t = -R @ cam_pos
    return np.concatenate([R, t[:, None]], 1)


def _write_custom_scene(root, n=4, size=48):
    """Synthetic COLMAP scene: cameras on a ring looking at a point cloud
    sphere at a known offset, written with our own colmap writer."""
    os.makedirs(f"{root}/images", exist_ok=True)
    center = np.array([0.3, -0.2, 0.5])
    radius = 0.4
    rs = np.random.RandomState(0)
    sph = rs.randn(2000, 3)
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    cloud = center + radius * sph
    write_ply_points(f"{root}/object_point_cloud.ply", cloud)
    # up along +z world, forward along +x
    np.savetxt(f"{root}/meta_info.txt",
               np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]))

    f = 60.0
    cams = {1: Camera(1, "SIMPLE_PINHOLE", size, size,
                      np.array([f, size / 2, size / 2], np.float64))}
    images = {}
    for k in range(n):
        phi = 2 * np.pi * k / n
        pos = center + 2.0 * np.array([np.cos(phi), np.sin(phi), 0.3])
        w2c = _look_at_w2c(pos - center)  # look at cloud center
        w2c[:, 3] = (w2c[:, :3] @ -pos)
        q = rotmat_to_qvec(w2c[:, :3])
        images[k + 1] = Image(k + 1, q, w2c[:, 3].copy(), 1, f"im{k}.png")
        cv2.imwrite(f"{root}/images/im{k}.png",
                    np.full((size, size, 3), 128, np.uint8))
    write_model(cams, images, {}, f"{root}/colmap/sparse/0")
    return center, radius


def test_custom_database_end_to_end(tmp_path):
    root = str(tmp_path / "obj")
    center, radius = _write_custom_scene(root)
    db = parse_database_name("custom/obj/64", str(tmp_path))

    ids = db.get_img_ids()
    assert len(ids) == 4
    # normalization: object cloud inside (slightly within) the unit sphere
    assert np.linalg.norm(db.ref_points, axis=-1).max() <= 1.0 + 1e-5
    assert np.linalg.norm(db.ref_points.mean(0)) < 0.05

    # every camera must look at the normalized object: the cloud center
    # (≈ origin) projects near the crop center
    for i in ids:
        pose, K = db.get_pose(i), db.get_K(i)
        cam = pose[:, :3] @ np.zeros(3) + pose[:, 3]
        assert cam[2] > 0, "object behind camera"
        uv = K @ cam
        uv = uv[:2] / uv[2]
        assert np.all(np.abs(uv - 32) < 16), uv
        img = db.get_image(i)
        assert img.shape[:2] == (64, 64)

    # cache roundtrip: second parse reads pickled cache
    db2 = parse_database_name("custom/obj/64", str(tmp_path))
    np.testing.assert_allclose(db2.get_pose(ids[0]), db.get_pose(ids[0]))


def test_nero_ray_batch_hits_object(tmp_path):
    root = str(tmp_path / "obj")
    _write_custom_scene(root)
    db = parse_database_name("custom/obj/64", str(tmp_path))
    info = build_imgs_info(db, db.get_img_ids(), with_mask=True)
    batch, h, w = construct_ray_batch(info)
    assert batch["rays_o"].shape == (4 * h * w, 3)
    np.testing.assert_allclose(np.linalg.norm(batch["rays_d"], axis=-1),
                               1.0, atol=1e-5)
    assert batch["human_poses"].shape == (4 * h * w, 3, 4)
    # center ray of view 0 must pass near the origin (normalized object)
    ci = (h // 2) * w + w // 2
    o, d = batch["rays_o"][ci], batch["rays_d"][ci]
    closest = o - np.dot(o, d) * d
    assert np.linalg.norm(closest) < 0.2
    # near/far bracket the unit sphere
    assert batch["near"][ci, 0] < np.dot(-o, d) < batch["far"][ci, 0]


def test_near_far_from_sphere():
    o = np.array([[0.0, 0.0, -3.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    near, far = near_far_from_sphere(o, d)
    np.testing.assert_allclose(near, [[2.0]], atol=1e-6)
    np.testing.assert_allclose(far, [[4.0]], atol=1e-6)


def test_glossy_synthetic_database(tmp_path):
    root = tmp_path / "pot"
    root.mkdir()
    size = 32
    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    pose = _look_at_w2c(np.array([0.0, -2.0, 0.5])).astype(np.float32)
    for k in range(3):
        with open(root / f"{k}-camera.pkl", "wb") as f:
            pickle.dump((pose, K), f)
        cv2.imwrite(str(root / f"{k}.png"),
                    np.full((size, size, 3), 100, np.uint8))
        depth = np.full((size, size), 2.0)
        depth[:4] = 15.0  # background band
        cv2.imwrite(str(root / f"{k}-depth.png"),
                    (depth / 15 * 65535).astype(np.uint16))

    db = GlossySyntheticDatabase("syn/pot", str(tmp_path))
    assert db.get_img_ids() == ["0", "1", "2"]
    np.testing.assert_allclose(db.get_K("1"), K)
    depth, mask = db.get_depth("0")
    np.testing.assert_allclose(depth[10, 10], 2.0, atol=1e-3)
    assert mask[0, 0] == 0.0 and mask[10, 10] == 1.0


def test_ply_points_roundtrip(tmp_path):
    pts = np.random.RandomState(1).randn(100, 3).astype(np.float32)
    fp = str(tmp_path / "p.ply")
    write_ply_points(fp, pts)
    np.testing.assert_allclose(read_ply_points(fp), pts)


def test_custom_rawmask_suffix_reads_mask_dir(tmp_path):
    """'custom/<scene>/<res>/rawmask' reads raw silhouettes from mask/
    instead of the eroded trust-region masks (round-5 bootstrap)."""
    import cv2

    root = tmp_path / "obj"
    _write_custom_scene(root)
    db = parse_database_name("custom/obj/64", str(tmp_path))
    img_id = db.get_img_ids()[0]
    stem = os.path.splitext(db.get_image_name(img_id))[0]
    os.makedirs(root / "mask", exist_ok=True)
    os.makedirs(root / "mask_erosion", exist_ok=True)
    cv2.imwrite(str(root / "mask" / f"{stem}.jpg"),
                np.full((8, 8), 255, np.uint8))
    cv2.imwrite(str(root / "mask_erosion" / f"{stem}.jpg"),
                np.zeros((8, 8), np.uint8))

    eroded = parse_database_name("custom/obj/64", str(tmp_path))
    raw = parse_database_name("custom/obj/64/rawmask", str(tmp_path))
    assert float(eroded.get_mask(img_id).max()) == 0.0
    assert float(raw.get_mask(img_id).min()) == 1.0


def test_test_split_holds_out_eighth(tmp_path):
    """No-split-file databases hold out ~1/8 of views for --split test
    (the reference's 128-of-1024 fraction), disjoint from the train ids."""
    from nunerf_tpu.data.database import get_database_split

    root = tmp_path / "obj"
    _write_custom_scene(root, n=16)
    db = parse_database_name("custom/obj/64", str(tmp_path))
    train_ids, test_ids = get_database_split(db, "test")
    assert len(test_ids) == 2
    assert not set(train_ids) & set(test_ids)
    assert len(train_ids) + len(test_ids) == 16
