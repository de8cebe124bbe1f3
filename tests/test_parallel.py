"""Multi-device tests on the virtual CPU mesh (SURVEY.md section 4 item d):
sharded rendering == single-device rendering; sharded grads == local grads."""

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.models.stage1 import ShapeRenderer
from nunerf_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from nunerf_tpu.train.loss import compute_losses

CFG = {
    "name": "par",
    "is_nerf": True,
    "get_mask": False,
    "shader_config": {"sphere_direction": False},
    "loss": ["nerf_render", "eikonal", "std"],
    "eikonal_weight": 0.1,
    "n_samples": 12,
    "n_bg_samples": 4,
    "n_importance": 4,
    "up_sample_steps": 2,
    "apply_occ_loss": False,
}


def _setup(rn=64):
    renderer = ShapeRenderer(CFG)
    params = renderer.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    origins = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (rn, 1))
    targets = rs.randn(rn, 3).astype(np.float32) * 0.3
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {
        "rays_o": origins, "rays_d": dirs.astype(np.float32),
        "near": np.full((rn, 1), 0.8, np.float32),
        "far": np.full((rn, 1), 4.5, np.float32),
        "rgbs": rs.rand(rn, 3).astype(np.float32),
        "masks": np.ones((rn,), np.float32),
    }
    return renderer, params, batch


def test_sharded_render_matches_single_device():
    renderer, params, batch = _setup()
    rng = jax.random.PRNGKey(3)
    step = jnp.asarray(10, jnp.int32)

    def fwd(params, batch, rng, step):
        return renderer.train_outputs(params, batch, rng, step)["ray_rgb"]

    single = jax.jit(fwd)(params, {k: jnp.asarray(v) for k, v in batch.items()},
                          rng, step)

    mesh = make_mesh(8)
    p_sh = jax.device_put(params, replicated(mesh))
    b_sh = shard_batch(batch, mesh)
    sharded = jax.jit(fwd)(p_sh, b_sh, rng, step)

    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-4, atol=2e-5)


def test_sharded_grads_match_single_device():
    renderer, params, batch = _setup()
    rng = jax.random.PRNGKey(3)
    step = jnp.asarray(10, jnp.int32)

    def loss_fn(params, batch, rng, step):
        outputs = renderer.train_outputs(params, batch, rng, step)
        return compute_losses(outputs, batch, step, renderer.cfg)["loss_total"]

    g_single = jax.jit(jax.grad(loss_fn))(
        params, {k: jnp.asarray(v) for k, v in batch.items()}, rng, step)

    mesh = make_mesh(8)
    p_sh = jax.device_put(params, replicated(mesh))
    b_sh = shard_batch(batch, mesh)
    g_sharded = jax.jit(jax.grad(loss_fn))(p_sh, b_sh, rng, step)

    flat1, tree1 = jax.tree_util.tree_flatten(g_single)
    flat2, tree2 = jax.tree_util.tree_flatten(g_sharded)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
