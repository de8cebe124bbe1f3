"""Multi-device tests on the virtual CPU mesh (SURVEY.md section 4 item d):
sharded rendering == single-device rendering; sharded grads == local grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# ---- stage-2 sharded correctness (frozen subtree + mesh constants + TIR
# masks under a data-sharded step; VERDICT round-1 gap) ---------------------

S2_S1_CFG = {
    "name": "par_s1", "is_nerf": True, "get_mask": False,
    "shader_config": {"sphere_direction": False},
    "n_samples": 12, "n_bg_samples": 4, "n_importance": 4,
    "up_sample_steps": 2, "apply_occ_loss": False,
}

S2_CFG = {
    "name": "par_s2", "is_nerf": True, "zero_thickness": True,
    "stage1_cfg": S2_S1_CFG,
    "shader_config": {"sphere_direction": False},
    "n_samples_outer": 16, "n_bg_importance": 4,
    "n_samples_inner": 8, "inner_up_rounds": 1, "inner_up_each": 4,
    "loss": ["nerf_render", "eikonal", "std"],
    "eikonal_weight": 0.02,
}


def _stage2_setup(rn=32):
    from nunerf_tpu.models.stage2 import Stage2Renderer
    from nunerf_tpu.tracing.mesh_ops import extract_geometry
    from nunerf_tpu.tracing.scene import Scene

    verts, tris = extract_geometry(
        lambda p: np.linalg.norm(p, axis=-1) - 0.5, resolution=24)
    scene = Scene((verts, tris), tile=512)
    s1 = ShapeRenderer(S2_S1_CFG)
    s1_params = s1.init_params(jax.random.PRNGKey(7))
    renderer = Stage2Renderer(S2_CFG, scene=scene, stage1_params=s1_params)
    params = renderer.init_params(jax.random.PRNGKey(8))

    rs = np.random.RandomState(0)
    origins = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (rn, 1))
    targets = rs.randn(rn, 3).astype(np.float32) * 0.3
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {"rays_o": origins, "rays_d": dirs.astype(np.float32),
             "rgbs": rs.rand(rn, 3).astype(np.float32)}
    return renderer, params, batch


@pytest.mark.slow  # ~93s CPU compile; the stage-1 sharded-grads test + dryrun_multichip cover the sharding contract
def test_stage2_sharded_step_matches_single_device():
    """One full stage-2 train step (3-bounce trace through the mesh, frozen
    stage-1 subtree under multi_transform, TIR-masked rgb loss) must produce
    identical loss/params sharded vs single-device — and the frozen subtree
    must receive EXACTLY zero updates in both."""
    import optax

    renderer, params, batch = _stage2_setup()
    rng = jax.random.PRNGKey(3)
    step = jnp.asarray(10, jnp.int32)

    def loss_fn(params, batch, rng, step):
        outputs = renderer.train_outputs(params, batch, rng, step)
        return compute_losses(outputs, batch, step, renderer.cfg)["loss_total"]

    labels = {k: ("frozen" if k in renderer.frozen_keys else "train")
              for k in params}
    optimizer = optax.multi_transform(
        {"train": optax.adam(1e-3), "frozen": optax.set_to_zero()}, labels)

    def train_step(params, opt_state, batch, rng, step):
        (loss, grads_out), grads = jax.value_and_grad(
            lambda *a: (loss_fn(*a), None), has_aux=True)(
            params, batch, rng, step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), grads, loss

    opt_state = optimizer.init(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    p1, g1, l1 = jax.jit(train_step)(params, opt_state, jb, rng, step)

    mesh = make_mesh(8)
    p_sh = jax.device_put(params, replicated(mesh))
    o_sh = jax.device_put(optimizer.init(params), replicated(mesh))
    b_sh = shard_batch(batch, mesh)
    p2, g2, l2 = jax.jit(train_step)(p_sh, o_sh, b_sh, rng, step)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    # gradients: sharded == single (the psum path).  Post-Adam params are
    # NOT compared elementwise: adam normalizes by sqrt(v), so an epsilon
    # gradient difference flips the sign of a full-lr update.
    for a, b in zip(jax.tree_util.tree_leaves(g1["train"]),
                    jax.tree_util.tree_leaves(g2["train"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)
    # frozen stage-1 subtree: exactly zero updates on both paths
    for a, b in zip(jax.tree_util.tree_leaves(p1["frozen"]),
                    jax.tree_util.tree_leaves(params["frozen"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(p2["frozen"]),
                    jax.tree_util.tree_leaves(params["frozen"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and training actually moved the trainable subtree
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                for a, b in zip(jax.tree_util.tree_leaves(p1["train"]),
                                jax.tree_util.tree_leaves(params["train"])))
    assert moved > 0
