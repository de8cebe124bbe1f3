"""Tile-culled closest-hit (the BVH stand-in, bvh.cu:255-301) must match the
brute-force Möller–Trumbore sweep exactly on hit distance and hit mask."""

import numpy as np
import pytest

from nunerf_tpu.tracing.intersect import (
    MISS_T,
    build_tile_index,
    pad_triangles,
    ray_mesh_intersect,
    ray_mesh_intersect_culled,
)
from nunerf_tpu.tracing.mesh_ops import extract_geometry
from nunerf_tpu.tracing.scene import Scene


def _two_blob_sdf(pts):
    a = np.linalg.norm(pts - np.array([0.25, 0.0, 0.1]), axis=-1) - 0.45
    b = np.linalg.norm(pts + np.array([0.3, 0.2, 0.0]), axis=-1) - 0.3
    return np.minimum(a, b)


@pytest.fixture(scope="module")
def blob_mesh():
    # res-96 extraction -> ~50k triangles: enough tiles that the sorted
    # descent runs several groups and the early exit actually fires
    return extract_geometry(_two_blob_sdf, resolution=96, bound=1.0)


@pytest.fixture(scope="module")
def random_rays():
    rs = np.random.RandomState(3)
    # mix of outside-in rays, inside-out rays, and guaranteed misses
    o = np.concatenate([
        rs.uniform(-2, 2, (96, 3)),
        rs.uniform(-0.2, 0.2, (64, 3)),
        np.full((32, 3), 3.0),
    ]).astype(np.float32)
    d = rs.normal(size=o.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_culled_matches_brute_force(blob_mesh, random_rays):
    verts, tris = blob_mesh
    o, d = random_rays
    v0, e1, e2 = pad_triangles(verts, tris, 1024)
    brute = ray_mesh_intersect(o, d, v0, e1, e2, tile=1024)
    idx = build_tile_index(verts, tris)
    cull = ray_mesh_intersect_culled(o, d, idx)

    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(cull.hit))
    # same MT math on both paths -> identical t bit patterns; allclose only
    # to allow different-but-tied triangles along shared edges
    np.testing.assert_allclose(np.asarray(brute.t), np.asarray(cull.t),
                               rtol=1e-6, atol=1e-6)
    # where the winning triangle differs it must be a genuine t tie
    bt, ct = np.asarray(brute.t), np.asarray(cull.t)
    differs = (np.asarray(brute.tri_idx) != np.asarray(cull.tri_idx))
    assert np.all(np.abs(bt[differs] - ct[differs]) <= 1e-6 * np.abs(
        bt[differs]).clip(min=1.0))


def test_culled_axis_aligned_rays(blob_mesh):
    """d with zero components exercises the safe-reciprocal slab test."""
    verts, tris = blob_mesh
    o = np.array([[0.25, 0.0, -2.0], [-0.3, -0.2, -2.0], [2.0, 2.0, -2.0],
                  [0.25, -2.0, 0.1]], np.float32)
    d = np.array([[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 1, 0]], np.float32)
    v0, e1, e2 = pad_triangles(verts, tris, 1024)
    brute = ray_mesh_intersect(o, d, v0, e1, e2, tile=1024)
    cull = ray_mesh_intersect_culled(o, d, build_tile_index(verts, tris))
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(cull.hit))
    np.testing.assert_allclose(np.asarray(brute.t), np.asarray(cull.t),
                               rtol=1e-6, atol=1e-6)


def test_culled_all_miss(blob_mesh):
    verts, tris = blob_mesh
    o = np.full((16, 3), 5.0, np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))
    cull = ray_mesh_intersect_culled(o, d, build_tile_index(verts, tris))
    assert not np.asarray(cull.hit).any()
    assert np.all(np.asarray(cull.t) == MISS_T)


def test_tiny_mesh_and_group_padding():
    """Meshes smaller than one tile group still work (padding tiles never hit)."""
    verts = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    o = np.array([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0]], np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    cull = ray_mesh_intersect_culled(o, d, build_tile_index(verts, tris))
    assert np.asarray(cull.hit).tolist() == [True, False]
    np.testing.assert_allclose(np.asarray(cull.t)[0], 1.0, rtol=1e-5)
    assert np.asarray(cull.tri_idx)[0] == 0


def test_scene_auto_cull_threshold(blob_mesh, random_rays):
    """Scene switches to the culled path above the threshold and its
    dintersect output is unchanged."""
    o, d = random_rays
    brute_scene = Scene(blob_mesh, cull_threshold=10 ** 9)
    cull_scene = Scene(blob_mesh, cull_threshold=1)
    assert brute_scene.tile_index is None
    assert cull_scene.tile_index is not None
    a = brute_scene.dintersect(o, d)
    b = cull_scene.dintersect(o, d)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a["pos"]), np.asarray(b["pos"]),
                               rtol=1e-5, atol=1e-5)


def test_scaled_tile_params_match_brute(blob_mesh, random_rays):
    """√n tile law (round 5): larger tiles + smaller groups must stay exact.
    Exercises the (tile, group) combinations Scene picks for big meshes."""
    verts, tris = blob_mesh
    o, d = random_rays
    v0, e1, e2 = pad_triangles(verts, tris, 1024)
    brute = ray_mesh_intersect(o, d, v0, e1, e2, tile=1024)
    for tile, group in ((512, 8), (1024, 4)):
        idx = build_tile_index(verts, tris, tile=tile, group=group)
        cull = ray_mesh_intersect_culled(o, d, idx, group=group)
        np.testing.assert_array_equal(np.asarray(cull.hit),
                                      np.asarray(brute.hit))
        np.testing.assert_allclose(np.asarray(cull.t)[np.asarray(brute.hit)],
                                   np.asarray(brute.t)[np.asarray(brute.hit)],
                                   rtol=0, atol=0)
