"""Silhouette-edge visibility sampling + two-bounce transparent tracing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunerf_tpu.tracing.mesh_ops import extract_geometry
from nunerf_tpu.tracing.scene import Scene


def sphere_sdf(pts, r=0.5):
    return np.linalg.norm(pts, axis=-1) - r


@pytest.fixture(scope="module")
def sphere_scene():
    verts, tris = extract_geometry(sphere_sdf, resolution=48, bound=1.0)
    return Scene((verts, tris))


def test_silhouette_edges_on_equator(sphere_scene):
    # viewed from far +z, silhouette verts of a sphere sit near z == 0
    origin = np.array([0.0, 0.0, 100.0], np.float32)
    edges, mask = sphere_scene.silhouette_edge(origin)
    mask = np.asarray(mask)
    assert mask.sum() > 10
    ev = np.asarray(sphere_scene.verts)[np.asarray(edges)[mask].ravel()]
    assert np.abs(ev[:, 2]).max() < 0.12  # near the equator (radius 0.5)


def test_trace2_center_ray_straight(sphere_scene):
    # a ray through the exact center refracts straight through (normal
    # incidence at both interfaces)
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    o2, d2, ok = sphere_scene.trace2(o, d)
    assert bool(ok[0])
    # tolerances at mesh-discretization level (the pole normal of a res-48
    # marching mesh tilts ~0.014 from the analytic sphere normal)
    np.testing.assert_allclose(np.asarray(d2[0]), [0, 0, -1], atol=5e-3)
    # exit point near the far surface z = -0.5
    assert abs(float(o2[0, 2]) + 0.5) < 0.05
    assert abs(float(o2[0, 0])) < 0.01 and abs(float(o2[0, 1])) < 0.01


def test_render_transparent_and_mask(sphere_scene):
    rs = np.random.RandomState(0)
    d = rs.randn(64, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, 2.0]], np.float32), (64, 1))
    oo, dd, mask = sphere_scene.render_transparent(jnp.asarray(o),
                                                   jnp.asarray(d))
    m = np.asarray(mask)
    hitmask = np.asarray(sphere_scene.render_mask(jnp.asarray(o),
                                                  jnp.asarray(d)))
    # escaped transparent rays are a subset of hit rays
    assert (m <= (hitmask > 0)).all()
    assert m.sum() > 0
    dd = np.asarray(dd)[m]
    np.testing.assert_allclose(np.linalg.norm(dd, axis=-1), 1.0, atol=1e-4)


@pytest.mark.slow  # ~43s; forward visibility test covers the rasterizer, this adds the grad check
def test_primary_visibility_gradients(sphere_scene):
    # camera at +z looking at origin (OpenCV world->cam pose)
    h = w = 64
    focal = 80.0
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    R = np.diag([1.0, -1.0, -1.0]).astype(np.float32)  # +z cam looks toward -z
    origin = np.array([0.0, 0.0, 2.0], np.float32)
    t = -R @ origin
    pose = np.concatenate([R, t[:, None]], -1).astype(np.float32)

    out = sphere_scene.primary_visibility(pose, K, origin, (h, w))
    valid = np.asarray(out["valid"])
    assert valid.sum() > 10
    idx = np.asarray(out["index"])[valid]
    # silhouette pixels form a ring around the image center
    rad = np.linalg.norm(idx - np.array([w / 2, h / 2]), axis=-1)
    assert rad.min() > 5 and rad.max() < w / 2

    # coverage gradient: flows to the vertex array, nonzero on silhouette
    def total_cov(verts):
        o = sphere_scene.primary_visibility(pose, K, origin, (h, w),
                                            verts=verts)
        return jnp.sum(jnp.where(o["valid"], o["value"], 0.0))

    # jitted so the persistent compile cache keeps repeat runs fast
    g = jax.jit(jax.grad(total_cov))(sphere_scene.verts)
    gn = np.linalg.norm(np.asarray(g), axis=-1)
    assert np.isfinite(gn).all()
    assert (gn > 0).sum() > 10
    # gradient touches only silhouette-edge vertices
    edges, mask = sphere_scene.silhouette_edge(origin)
    silh_verts = set(np.asarray(edges)[np.asarray(mask)].ravel().tolist())
    nz = set(np.nonzero(gn)[0].tolist())
    assert nz <= silh_verts
