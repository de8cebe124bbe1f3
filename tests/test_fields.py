"""Field network tests: shapes, initialization statistics, geometric init."""

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.fields.sdf import SDFNetwork
from nunerf_tpu.fields.nerf import NeRFNetwork
from nunerf_tpu.fields.variance import SingleVarianceNetwork
from nunerf_tpu.fields.shading import AppShadingNetwork
from nunerf_tpu.fields.aux import InfOutNetwork, IoRNetwork, ThicknessNetwork
from nunerf_tpu.fields.mlp import Predictor, WNDense


def test_wn_dense_matches_plain_at_init():
    """Weight-norm with g = ||V|| must reproduce the plain linear output."""
    layer = WNDense(8)
    x = jnp.ones((4, 5))
    params = layer.init(jax.random.PRNGKey(0), x)
    v = params["params"]["v"]
    b = params["params"]["b"]
    out = layer.apply(params, x)
    np.testing.assert_allclose(out, x @ v + b, rtol=1e-5, atol=1e-6)


def test_predictor_final_bias():
    p = Predictor(3, final_bias=np.log(0.5))
    params = p.init(jax.random.PRNGKey(0), jnp.ones((2, 72)))
    np.testing.assert_allclose(params["params"]["out"]["b"], np.log(0.5), rtol=1e-6)


def test_sdf_geometric_init_is_spherical():
    """Geometric init: SDF(x) ~ |x| - bias near init (NeuS sphere init)."""
    net = SDFNetwork()
    pts = jnp.asarray(np.random.RandomState(0).randn(256, 3).astype(np.float32) * 0.6)
    params = net.init(jax.random.PRNGKey(1), pts)
    out = net.apply(params, pts)
    assert out.shape == (256, 257)
    sdf = np.asarray(out[:, 0])
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    # correlation with (|x| - 0.5) should be strong (posenc perturbs the
    # perfect sphere, as in the reference); negative inside, positive outside
    expected = r - 0.5
    corr = np.corrcoef(sdf, expected)[0, 1]
    assert corr > 0.85, corr
    assert np.mean(sdf[r < 0.25]) < 0
    assert np.mean(sdf[r > 1.0]) > 0


def test_sdf_gradient_near_unit_norm():
    net = SDFNetwork()
    pts = jnp.asarray(np.random.RandomState(2).randn(64, 3).astype(np.float32) * 0.5)
    params = net.init(jax.random.PRNGKey(1), pts)

    def sdf_single(p):
        return net.apply(params, p[None])[0, 0]

    grads = jax.vmap(jax.grad(sdf_single))(pts)
    norms = jnp.linalg.norm(grads, axis=-1)
    # geometric init gives roughly-unit gradients (posenc adds noise); the
    # eikonal loss tightens this during training
    assert float(jnp.mean(jnp.abs(norms - 1.0))) < 0.5
    assert np.all(np.isfinite(np.asarray(grads)))


def test_variance_network():
    net = SingleVarianceNetwork(init_val=0.3)
    x = jnp.ones((5, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (5, 1)
    np.testing.assert_allclose(out, np.exp(3.0), rtol=1e-5)


def test_nerf_network_shapes_and_density_consistency():
    net = NeRFNetwork(rgb_bias_init=float(np.log(0.5)))
    pts = jnp.ones((10, 4)) * 0.3
    views = jnp.ones((10, 3)) * 0.5
    params = net.init(jax.random.PRNGKey(0), pts, views)
    alpha, rgb = net.apply(params, pts, views)
    assert alpha.shape == (10, 1) and rgb.shape == (10, 3)
    d = net.apply(params, pts, method=NeRFNetwork.density)
    np.testing.assert_allclose(d, alpha, rtol=1e-5, atol=1e-6)


def test_shading_network_forward():
    net = AppShadingNetwork()
    n = 6
    rng = np.random.RandomState(3)
    points = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
    normals = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    view_dirs = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 256).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), points, normals, view_dirs, feats)
    color, occ_info = net.apply(params, points, normals, view_dirs, feats)
    assert color.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(color)))
    assert occ_info["occ_prob"].shape == (n, 1)
    assert occ_info["transmission_weight"].shape == (n, 1)

    # intermediate results path
    color2, occ2, inter = net.apply(params, points, normals, view_dirs, feats,
                                    inter_results=True)
    np.testing.assert_allclose(color2, color, atol=1e-6)
    for k in ("specular_color", "diffuse_color", "roughness", "refraction_light"):
        assert k in inter

    # s2 interface shading reusing the same params
    c3, occ3 = net.apply(params, points, normals, view_dirs, feats, False,
                         method=AppShadingNetwork.s2_shade)
    assert c3.shape == (n, 3)
    assert "refraction_coefficient" in occ3
    c4, _ = net.apply(params, points, normals, view_dirs, feats, True,
                      method=AppShadingNetwork.s2_shade)
    np.testing.assert_allclose(np.asarray(c4), np.asarray(c4) * 0 + float(
        np.asarray(c4)[0, 0]), atol=1e-5)  # internal -> constant srgb(0)


def test_shading_sphere_direction_variant():
    net = AppShadingNetwork(sphere_direction=True)
    n = 4
    rng = np.random.RandomState(4)
    points = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
    normals = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    view_dirs = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 256).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), points, normals, view_dirs, feats)
    color, _ = net.apply(params, points, normals, view_dirs, feats)
    assert color.shape == (n, 3)
    # outer_light input dim must be 144 for sphere_direction
    assert params["params"]["outer_light"]["hidden_0"]["v"].shape[0] == 144


def test_aux_networks():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((3, 3)) * 0.2
    inf = InfOutNetwork()
    p = inf.init(rng, x)
    assert inf.apply(p, x).shape == (3, 3)
    assert np.all(np.asarray(inf.apply(p, x)) >= 0)  # relu output
    ior = IoRNetwork()
    p = ior.init(rng, x)
    out = ior.apply(p, x)
    assert out.shape == (3, 1) and np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))
    th = ThicknessNetwork()
    p = th.init(rng, x)
    assert th.apply(p, x).shape == (3, 1)
