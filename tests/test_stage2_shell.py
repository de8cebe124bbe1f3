"""Non-zero-thickness (curvature shell) stage-2 tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunerf_tpu.models.stage1 import ShapeRenderer
from nunerf_tpu.models.stage2_shell import Stage2ShellRenderer
from nunerf_tpu.tracing.mesh_ops import extract_geometry, isotropic_remesh
from nunerf_tpu.tracing.scene import Scene
from tests.test_stage2 import S1_CFG

S2_SHELL_CFG = {
    "name": "s2shell",
    "is_nerf": True,
    "zero_thickness": False,
    "stage1_cfg": S1_CFG,
    "shader_config": {"sphere_direction": False},
    "n_samples_outer": 16,
    "n_samples_inner": 8,
    "inner_up_rounds": 2,
    "inner_up_each": 4,
    "loss": ["nerf_render", "eikonal", "std"],
    "eikonal_weight": 0.02,
}


@pytest.fixture(scope="module")
def shell_setup():
    def sphere_sdf(p):
        return np.linalg.norm(p, axis=-1) - 0.5

    verts, tris = extract_geometry(sphere_sdf, resolution=48)
    # shell mode interpolates curvature -> use the remeshed surface like the
    # reference pipeline (extract -> remesh -> Scene)
    verts, tris = isotropic_remesh(verts, tris, target_edge=0.04)
    scene = Scene((verts, tris), tile=512)

    s1 = ShapeRenderer(S1_CFG)
    s1_params = s1.init_params(jax.random.PRNGKey(7))
    renderer = Stage2ShellRenderer(S2_SHELL_CFG, scene=scene,
                                   stage1_params=s1_params)
    params = renderer.init_params(jax.random.PRNGKey(8))
    return renderer, params


def _camera_rays(n=24):
    rs = np.random.RandomState(0)
    origins = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n, 1))
    targets = rs.randn(n, 3).astype(np.float32) * 0.25
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(dirs)


def test_shell_trace_geometry(shell_setup):
    renderer, params = shell_setup
    rays_o, rays_d = _camera_rays()
    bounces, tir_mask = renderer.ray_trace(params, rays_o, rays_d)
    assert len(bounces) == 3
    b0, b1 = bounces[0], bounces[1]
    assert int(jnp.sum(b0["hit"])) > 15
    hit0 = np.asarray(b0["hit"])
    r0 = np.linalg.norm(np.asarray(b0["pos"])[hit0], axis=-1)
    np.testing.assert_allclose(r0, 0.5, atol=0.05)
    # bounce-1 start is just inside the shell (shell thickness <= 0.01)
    st1 = np.linalg.norm(np.asarray(b1["start"])[hit0], axis=-1)
    assert np.all(st1 < 0.51)
    assert np.all(st1 > 0.4)
    # on the exit bounce the interface point is pulled to the inner shell
    hit1 = np.asarray(b1["hit"])
    if hit1.sum() > 0:
        r1 = np.linalg.norm(np.asarray(b1["pos"])[hit1], axis=-1)
        assert np.all(r1 < 0.52)


def test_shell_center_ray_straight(shell_setup):
    renderer, params = shell_setup
    o = jnp.array([[0.0, 0.0, -2.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    bounces, _ = renderer.ray_trace(params, o, d)
    for b in bounces[1:]:
        if bool(b["active"][0]):
            np.testing.assert_allclose(np.asarray(b["dir"][0]), [0, 0, 1],
                                       atol=0.05)


@pytest.mark.slow  # ~110s CPU compile; trace geometry + stage-2 grad tests cover the pieces
def test_shell_render_and_grads(shell_setup):
    from nunerf_tpu.train.loss import compute_losses

    renderer, params = shell_setup
    rays_o, rays_d = _camera_rays(12)
    batch = {"rays_o": rays_o, "rays_d": rays_d,
             "rgbs": jnp.ones((12, 3)) * 0.5,
             "masks": jnp.ones((12,))}

    def loss_fn(p):
        outputs = renderer.train_outputs(p, batch, jax.random.PRNGKey(1),
                                         jnp.asarray(10, jnp.int32))
        terms = compute_losses(outputs, batch, 10, renderer.cfg)
        return terms["loss_total"], outputs

    (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(outputs["ray_rgb"])))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    def gsum(tree):
        return sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree_util.tree_leaves(tree))

    assert gsum(grads["train"]["sdf_inner"]) > 0
    # shell mode trains IoR and thickness fields through the refraction path
    assert gsum(grads["train"]["ior"]) > 0
    assert gsum(grads["train"]["thickness"]) > 0
    assert gsum(grads["frozen"]) == 0.0


def test_absorption_param_and_transmission_dimming(shell_setup):
    """learn_absorption: Beer-Lambert exp(-kappa*chord) on the glass chords
    (round-5, verdict item 3).  kappa ~ 0 reproduces the no-absorption
    render; a large kappa dims the transmitted radiance."""
    renderer, params = shell_setup
    cfg = dict(S2_SHELL_CFG, learn_absorption=True)
    r2 = Stage2ShellRenderer(cfg, scene=renderer.scene,
                             stage1_params=renderer.stage1_params)
    p2 = r2.init_params(jax.random.PRNGKey(8))
    assert "absorption" in p2["train"]

    rays_o, rays_d = _camera_rays()
    rng = jax.random.PRNGKey(3)
    base = renderer.render(params, rays_o, rays_d, rng, step=0,
                           is_train=False)["ray_rgb"]

    # kappa -> 0: matches the absorption-free render
    p_zero = jax.tree_util.tree_map(lambda x: x, p2)
    p_zero["train"]["absorption"] = jnp.full((3,), -20.0)
    off = r2.render(p_zero, rays_o, rays_d, rng, step=0,
                    is_train=False)["ray_rgb"]
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), atol=1e-5)

    # large kappa: transmitted radiance must drop on through-glass lanes
    p_hi = jax.tree_util.tree_map(lambda x: x, p2)
    p_hi["train"]["absorption"] = jnp.full((3,), 8.0)
    hi = r2.render(p_hi, rays_o, rays_d, rng, step=0,
                   is_train=False)["ray_rgb"]
    assert float(jnp.mean(hi)) < float(jnp.mean(base))
    assert np.all(np.isfinite(np.asarray(hi)))


@pytest.mark.slow  # compiles the full shell backward; the dimming test covers the forward term
def test_absorption_grad_reaches_kappa_and_thickness(shell_setup):
    """The Beer-Lambert term must backprop to kappa AND (through the chord
    length) to the thickness net — that is the whole point of item 3."""
    renderer, params = shell_setup
    cfg = dict(S2_SHELL_CFG, learn_absorption=True)
    r2 = Stage2ShellRenderer(cfg, scene=renderer.scene,
                             stage1_params=renderer.stage1_params)
    p2 = r2.init_params(jax.random.PRNGKey(8))
    p2["train"]["absorption"] = jnp.full((3,), 1.0)
    rays_o, rays_d = _camera_rays()
    rng = jax.random.PRNGKey(3)

    def loss_fn(train):
        p = {"train": train, "frozen": p2["frozen"]}
        out = r2.render(p, rays_o, rays_d, rng, step=10**6, is_train=True)
        return jnp.mean(out["ray_rgb"])

    g = jax.grad(loss_fn)(p2["train"])
    assert float(jnp.max(jnp.abs(g["absorption"]))) > 0.0
    th_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["thickness"], 0.0)
    assert th_g > 0.0
