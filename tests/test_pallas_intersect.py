"""Pallas intersection kernel vs the XLA sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.ops.pallas_intersect import pallas_ray_mesh_intersect
from nunerf_tpu.tracing.intersect import pad_triangles, ray_mesh_intersect
from nunerf_tpu.tracing.mesh_ops import extract_geometry
from nunerf_tpu.tracing.scene import Scene


def _mesh_and_rays():
    def sphere_sdf(p):
        return np.linalg.norm(p, axis=-1) - 0.5

    verts, tris = extract_geometry(sphere_sdf, resolution=32)
    v0, e1, e2 = pad_triangles(verts.astype(np.float32), tris, tile=1024)
    rs = np.random.RandomState(0)
    rn = 64
    o = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (rn, 1))
    tg = rs.randn(rn, 3).astype(np.float32) * 0.4
    d = tg - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
            jnp.asarray(e2), (verts, tris))


def test_pallas_kernel_matches_xla():
    o, d, v0, e1, e2, _ = _mesh_and_rays()
    t_p, i_p, h_p = pallas_ray_mesh_intersect(o, d, v0, e1, e2, interpret=True)
    ref = ray_mesh_intersect(o, d, v0, e1, e2, tile=1024)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(ref.hit))
    both = np.asarray(h_p) & np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(t_p)[both], np.asarray(ref.t)[both],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_p)[both],
                                  np.asarray(ref.tri_idx)[both])


def test_scene_pallas_backend():
    o, d, _, _, _, mesh = _mesh_and_rays()
    scene_x = Scene(mesh, tile=1024, use_pallas=False)
    scene_p = Scene(mesh, tile=1024, use_pallas=True)
    hx = scene_x.intersect(o, d)
    hp = scene_p.intersect(o, d)
    np.testing.assert_array_equal(np.asarray(hx.hit), np.asarray(hp.hit))
    both = np.asarray(hx.hit)
    np.testing.assert_allclose(np.asarray(hx.t)[both], np.asarray(hp.t)[both],
                               rtol=1e-6)
