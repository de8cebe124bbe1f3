"""Unit tests for core math ops against closed forms / reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunerf_tpu.ops.embedder import posenc, posenc_dim
from nunerf_tpu.ops.geometry import (
    fresnel_dielectric,
    get_sphere_intersection,
    near_far_from_sphere,
    normalize,
    offset_points_to_sphere,
    ray_sphere_hit,
    reflect,
    refract,
    schlick_weight,
)
from nunerf_tpu.ops.ide import ide_dim, ipe, make_ide_fn
from nunerf_tpu.ops.sampling import sample_pdf, get_intersection
from nunerf_tpu.ops.srgb import linear_to_srgb, srgb_to_linear
from nunerf_tpu.ops.volume import alpha_to_weights, exclusive_cumprod
from nunerf_tpu.ops.fg_lut import compute_fg_lut, fg_lookup


def test_posenc_shape_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = posenc(x, 6)
    assert out.shape == (1, posenc_dim(6))
    assert posenc_dim(6) == 3 + 2 * 6 * 3
    # identity part
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    # first frequency block: sin(x), cos(x)
    np.testing.assert_allclose(out[0, 3:6], np.sin(x[0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(x[0]), rtol=1e-6)
    # last frequency 2^5
    np.testing.assert_allclose(out[0, -3:], np.cos(32.0 * x[0]), rtol=1e-5, atol=1e-5)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 101)
    y = srgb_to_linear(linear_to_srgb(x))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_reflect_unit():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wo = normalize(jnp.array([[1.0, 0.0, 1.0]]))
    r = reflect(wo, n)
    np.testing.assert_allclose(r, normalize(jnp.array([[-1.0, 0.0, 1.0]])), atol=1e-6)


def test_refract_snell_closed_form():
    # air -> glass (n=1.5) at 45 degrees: sin(theta_t) = sin(45)/1.5
    n = jnp.array([[0.0, 0.0, 1.0]])
    wi = normalize(jnp.array([[1.0, 0.0, 1.0]]))  # pointing away from surface
    eta = 1.0 / 1.5
    wt, tir = refract(wi, n, eta)
    assert not bool(tir[0])
    wt = normalize(wt)
    sin_t = float(jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2))
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-6)
    assert float(wt[0, 2]) < 0  # transmitted into the surface


def test_refract_tir():
    # glass -> air beyond critical angle (41.8 deg): 60 deg -> TIR
    n = jnp.array([[0.0, 0.0, 1.0]])
    theta = np.deg2rad(60.0)
    wi = jnp.array([[np.sin(theta), 0.0, np.cos(theta)]])
    _, tir = refract(wi, n, 1.5)
    assert bool(tir[0])


def test_fresnel_normal_incidence():
    # R0 = ((n1-n2)/(n1+n2))^2 = (0.5/2.5)^2 = 0.04
    fr = fresnel_dielectric(jnp.array([1.0]), 1.0, 1.5)
    np.testing.assert_allclose(fr, [0.04], atol=1e-6)
    # grazing -> 1
    fr = fresnel_dielectric(jnp.array([0.001]), 1.0, 1.5)
    assert float(fr[0]) > 0.9


def test_sphere_intersection():
    pts = jnp.array([[0.0, 0.0, 0.0]])
    dirs = jnp.array([[1.0, 0.0, 0.0]])
    d = get_sphere_intersection(pts, dirs)
    np.testing.assert_allclose(d, [[1.0]], atol=1e-3)

    t0, t1, hit = ray_sphere_hit(jnp.array([[-2.0, 0.0, 0.0]]), dirs)
    assert bool(hit[0])
    np.testing.assert_allclose(t0, [1.0], atol=1e-5)
    np.testing.assert_allclose(t1, [3.0], atol=1e-5)


def test_near_far_from_sphere():
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = near_far_from_sphere(o, d)
    np.testing.assert_allclose(near, [[2.0]], atol=1e-5)
    np.testing.assert_allclose(far, [[4.0]], atol=1e-5)


def test_offset_points_to_sphere():
    pts = jnp.array([[2.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
    out = offset_points_to_sphere(pts)
    np.testing.assert_allclose(out[0], [0.999, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[1], pts[1], atol=1e-7)


def test_schlick():
    np.testing.assert_allclose(schlick_weight(jnp.array([[1.0]])), [[0.04]], atol=1e-6)
    np.testing.assert_allclose(schlick_weight(jnp.array([[0.0]])), [[1.0]], atol=1e-6)


def test_sample_pdf_uniform_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
    weights = jnp.ones((4, 8))
    s = sample_pdf(bins, weights, 16, det=True)
    assert s.shape == (4, 16)
    # uniform weights -> approximately uniform stratified samples
    np.testing.assert_allclose(np.asarray(s[0]),
                               np.linspace(0.5 / 16, 1 - 0.5 / 16, 16), atol=0.01)


def test_sample_pdf_concentrated():
    bins = jnp.linspace(0.0, 1.0, 11)[None]
    weights = jnp.zeros((1, 10)).at[0, 5].set(1.0)
    s = sample_pdf(bins, weights, 8, det=True)
    # nearly all samples inside bin 5 = [0.5, 0.6]
    inside = jnp.sum((s >= 0.45) & (s <= 0.65))
    assert int(inside) >= 7


def test_exclusive_cumprod_and_weights():
    alpha = jnp.array([[0.5, 0.5, 1.0]])
    t = exclusive_cumprod(1 - alpha)
    np.testing.assert_allclose(t, [[1.0, 0.5, 0.25]], atol=1e-6)
    w = alpha_to_weights(alpha)
    np.testing.assert_allclose(jnp.sum(w), 1.0, atol=1e-5)


def test_ide_against_reference_impl():
    """Check the real-arithmetic IDE against a direct complex-valued port of
    the reference math (utils/ref_utils.py:84-114)."""
    deg = 5
    ide_fn = make_ide_fn(deg)
    rng = np.random.RandomState(0)
    xyz = rng.randn(16, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = rng.rand(16, 1).astype(np.float32) * 0.5

    out = np.asarray(ide_fn(jnp.asarray(xyz), jnp.asarray(kappa_inv)))
    assert out.shape == (16, ide_dim(deg))
    assert ide_dim(deg) == 72

    # independent complex-number evaluation of Ref-NeRF eqs 6-8
    from nunerf_tpu.ops.ide import _ide_tables
    ml_array, mat = _ide_tables(deg)
    x, y, z = xyz[:, :1], xyz[:, 1:2], xyz[:, 2:3]
    vmz = np.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
    vmxy = np.concatenate([(x + 1j * y) ** m for m in ml_array[0]], axis=-1)
    sph = vmxy * (vmz @ mat)
    sigma = 0.5 * ml_array[1] * (ml_array[1] + 1)
    ide_ref = sph * np.exp(-sigma * kappa_inv)
    expected = np.concatenate([ide_ref.real, ide_ref.imag], axis=-1)
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)


def test_ipe_shapes_and_attenuation():
    mean = jnp.zeros((4, 2))
    var = jnp.zeros((4, 2))
    out = ipe(mean, var, 0, 6)
    assert out.shape == (4, 2 * 2 * 6)
    # zero mean, zero var: sin(0)=0 and sin(pi/2)=1
    np.testing.assert_allclose(out[0, :12], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 12:], 1.0, atol=1e-6)
    # large variance attenuates to 0
    out2 = ipe(mean, 100 * jnp.ones((4, 2)), 0, 6)
    np.testing.assert_allclose(out2, 0.0, atol=1e-3)


def test_fg_lut_properties():
    lut = compute_fg_lut(res=32, n_samples=128)
    assert lut.shape == (32, 32, 2)
    assert np.all(lut >= 0) and np.all(lut <= 1.5)
    # smooth surface, head-on view: A + B ~ 1 (energy conservation-ish).
    # Layout: rows = roughness, cols = NoV (the reference asset convention).
    a, b = lut[0, -1]  # roughness~0, NoV~1
    assert 0.9 < a + b <= 1.05

    # bilinear lookup at texel centers returns the texel
    val = fg_lookup(jnp.asarray(lut), jnp.array([[(31 + 0.5) / 32]]),
                    jnp.array([[0.5 / 32]]))
    np.testing.assert_allclose(val[0], lut[0, -1], atol=1e-6)


def test_get_intersection_sphere_sdf():
    """Secondary march against an analytic sphere SDF of radius 0.5: a ray
    from the center must hit at distance ~0.5 with total weight ~1."""
    def sdf_fn(x):
        return (jnp.linalg.norm(x, axis=-1, keepdims=True) - 0.5)

    def inv_s_fn(x):
        return jnp.full((*x.shape[:-1], 1), 512.0)

    # rays start inside the unit bounding sphere but outside the r=0.5
    # object, pointing at the center: entry crossing at distance 0.9 - 0.5.
    rs = np.random.RandomState(1)
    origins = rs.randn(4, 3).astype(np.float32)
    origins = 0.9 * origins / np.linalg.norm(origins, axis=-1, keepdims=True)
    pts = jnp.asarray(origins)
    dirs = normalize(-pts)
    z, w, s = get_intersection(sdf_fn, inv_s_fn, pts, dirs, sn0=64, sn1=16)
    hit_prob = jnp.sum(w, -1)
    np.testing.assert_allclose(hit_prob, np.ones(4), atol=0.05)
    exp_depth = jnp.sum(w * z, -1) / jnp.maximum(hit_prob, 1e-6)
    np.testing.assert_allclose(exp_depth, 0.4 * np.ones(4), atol=0.05)

    # rays starting outside the unit sphere are masked out
    far_pts = jnp.ones((2, 3)) * 2.0
    z2, w2, s2 = get_intersection(sdf_fn, inv_s_fn, far_pts, dirs[:2])
    np.testing.assert_allclose(w2, 0.0, atol=1e-7)
    np.testing.assert_allclose(s2, -1.0, atol=1e-7)


def test_merge_z_vals_rank_path_matches_argsort(monkeypatch):
    """The env-gated rank merge must be bit-identical to the stable argsort
    on sorted inputs including ties (the sorted-ascending precondition is
    load-bearing for the comparison-count ranks, not just a fast path)."""
    import nunerf_tpu.ops.sampling as sampling

    rs = np.random.RandomState(0)
    for trial in range(20):
        s1, s2 = rs.randint(2, 9), rs.randint(2, 9)
        a = np.sort(rs.randint(0, 6, size=(3, s1)).astype(np.float32), -1)
        b = np.sort(rs.randint(0, 6, size=(3, s2)).astype(np.float32), -1)
        sa = rs.randn(3, s1).astype(np.float32)
        sb = rs.randn(3, s2).astype(np.float32)

        monkeypatch.setattr(sampling, "_MERGE_RANK", False)
        z_ref, s_ref = sampling.merge_z_vals(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(sa), jnp.asarray(sb))
        monkeypatch.setattr(sampling, "_MERGE_RANK", True)
        z_rank, s_rank = sampling.merge_z_vals(jnp.asarray(a), jnp.asarray(b),
                                               jnp.asarray(sa), jnp.asarray(sb))
        np.testing.assert_array_equal(np.asarray(z_ref), np.asarray(z_rank))
        np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_rank))


def test_warm_up_cos_host_matches_device_schedule():
    """The host logging twin and the optax schedule must agree (they are
    derived from one formula; this pins that contract)."""
    from nunerf_tpu.train.lr import warm_up_cos_host, warm_up_cos_schedule

    dev = warm_up_cos_schedule(lr=3e-4, end_warm=1000, end_iter=60000)
    host = warm_up_cos_host(lr=3e-4, end_warm=1000, end_iter=60000)
    for step in (0, 1, 500, 999, 1000, 1001, 15000, 59999, 60000):
        np.testing.assert_allclose(float(dev(step)), host(step), rtol=1e-6)
