"""End-to-end stage-1 tests on a tiny synthetic scene (8-device CPU mesh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.scene_utils import make_test_scene

TINY_CFG = {
    "name": "tiny",
    "network": "shape",
    "database_name": "nerf/tiny_sphere",
    "is_nerf": True,
    "get_mask": False,
    "zero_thickness": True,
    "shader_config": {"sphere_direction": False, "human_light": False},
    "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ", "mask",
             "outer_reg"],
    "key_metric_name": "psnr",
    "eikonal_weight": 0.1,
    # small sampling budget for CPU tests
    "n_samples": 16,
    "n_bg_samples": 8,
    "n_importance": 8,
    "up_sample_steps": 2,
    "train_ray_num": 64,
    "test_ray_num": 128,
    "occ_loss_step": 5,
    "occ_loss_max_pn": 32,
    "apply_occ_loss": True,
    "anneal_end": 100,
}


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    make_test_scene(str(root / "tiny_sphere"), h=24, w=24)
    return str(root)


@pytest.fixture(scope="module")
def renderer_and_data(scene_dir):
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.data.database import parse_database_name, get_database_split
    from nunerf_tpu.data.ray_store import build_imgs_info, construct_nerf_ray_batch

    cfg = dict(TINY_CFG, dataset_dir=scene_dir)
    renderer = ShapeRenderer(cfg)
    db = parse_database_name(cfg["database_name"], scene_dir)
    train_ids, test_ids = get_database_split(db)
    info = build_imgs_info(db, train_ids)
    batch, h, w = construct_nerf_ray_batch(info)
    params = renderer.init_params(jax.random.PRNGKey(0))
    return renderer, params, batch


def test_database_and_rays(scene_dir):
    from nunerf_tpu.data.database import parse_database_name, get_database_split
    from nunerf_tpu.data.ray_store import build_imgs_info, construct_nerf_ray_batch

    db = parse_database_name("nerf/tiny_sphere", scene_dir)
    ids = db.get_img_ids()
    assert len(ids) == 6 + 1  # testskip=64 keeps 1 of the test frames
    train_ids, test_ids = get_database_split(db)
    assert len(test_ids) == 1 and len(train_ids) == 6
    info = build_imgs_info(db, train_ids)
    assert info["imgs"].shape == (6, 24, 24, 3)
    batch, h, w = construct_nerf_ray_batch(info)
    assert batch["rays_o"].shape == (6 * 24 * 24, 3)
    # rays through the image center must hit the unit sphere (object at origin)
    center_ray = 24 * 12 + 12
    o, d = batch["rays_o"][center_ray], batch["rays_d"][center_ray]
    b = np.dot(o, d)
    c = np.dot(o, o) - 1.0
    assert b * b - c > 0, "central ray misses the unit sphere"
    # mask should match the sphere silhouette: some in, some out
    assert 0.05 < batch["masks"].mean() < 0.95


@pytest.mark.slow  # ~105s CPU compile; test_short_training_decreases_loss drives the same step
def test_train_forward_and_grads(renderer_and_data):
    from nunerf_tpu.train.loss import compute_losses

    renderer, params, batch = renderer_and_data
    rn = 64
    sub = {k: jnp.asarray(v[:rn]) for k, v in batch.items()}

    def loss_fn(p):
        outputs = renderer.train_outputs(p, sub, jax.random.PRNGKey(1),
                                         jnp.asarray(10, jnp.int32))
        terms = compute_losses(outputs, sub, 10, renderer.cfg)
        return terms["loss_total"], (outputs, terms)

    (loss, (outputs, terms)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert outputs["ray_rgb"].shape == (rn, 3)
    # every parameter group receives finite gradients
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # sdf params must get nonzero gradient
    gsdf = jax.tree_util.tree_leaves(grads["sdf"])
    assert sum(float(jnp.sum(jnp.abs(g))) for g in gsdf) > 0


@pytest.mark.slow  # ~42s; short-training test drives the same cond branches
def test_occ_loss_cond_gating(renderer_and_data):
    renderer, params, batch = renderer_and_data
    rn = 64
    sub = {k: jnp.asarray(v[:rn]) for k, v in batch.items()}
    out_early = renderer.train_outputs(params, sub, jax.random.PRNGKey(1),
                                       jnp.asarray(0, jnp.int32))
    assert float(out_early["loss_occ"]) == 0.0
    out_late = renderer.train_outputs(params, sub, jax.random.PRNGKey(1),
                                      jnp.asarray(10, jnp.int32))
    assert np.isfinite(float(out_late["loss_occ"]))


def test_short_training_decreases_loss(scene_dir, tmp_path):
    """A few optimizer steps on the tiny scene must reduce the rgb loss."""
    import optax
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.data.database import parse_database_name, get_database_split
    from nunerf_tpu.data.ray_store import (build_imgs_info,
                                           construct_nerf_ray_batch, RayStore)
    from nunerf_tpu.train.loss import compute_losses

    cfg = dict(TINY_CFG, dataset_dir=scene_dir, apply_occ_loss=False)
    renderer = ShapeRenderer(cfg)
    db = parse_database_name(cfg["database_name"], scene_dir)
    train_ids, _ = get_database_split(db)
    info = build_imgs_info(db, train_ids)
    batch, _, _ = construct_nerf_ray_batch(info)
    store = RayStore(batch, 64, seed=0)

    params = renderer.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch, rng, step):
        def loss_fn(p):
            outputs = renderer.train_outputs(p, batch, rng, step)
            terms = compute_losses(outputs, batch, step, renderer.cfg)
            return terms["loss_total"], terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, terms

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        b = {k: jnp.asarray(v) for k, v in store.next_batch().items()}
        params, opt_state, terms = step_fn(params, opt_state, b, sub,
                                           jnp.asarray(i, jnp.int32))
        losses.append(float(terms["loss_rgb"]))

    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_acc_sdf_mask_loss_for_nonnerf(renderer_and_data):
    """Round-5 bootstrap: with use_mask_loss on a non-nerf config, the mask
    supervises acc_sdf (SDF-branch opacity) — total acc saturates under the
    NeRF++ background and carries no silhouette signal."""
    from nunerf_tpu.models.stage1 import ShapeRenderer

    renderer, params, batch = renderer_and_data
    cfg = dict(renderer.cfg, is_nerf=False, use_mask_loss=True)
    r2 = ShapeRenderer(cfg)
    n = 24
    b = {k: (v[:n] if hasattr(v, "shape") and v.ndim >= 1 else v)
         for k, v in batch.items()}
    b["masks"] = jnp.zeros((n,), jnp.float32)
    out = r2.train_outputs(params, b, jax.random.PRNGKey(0),
                           step=jnp.asarray(100))
    assert "loss_mask" in out
    # zero-mask target: the loss equals mean(acc_sdf), NOT mean(acc)
    np.testing.assert_allclose(float(out["loss_mask"]),
                               float(jnp.mean(out["acc_sdf"])), rtol=1e-5)
    assert float(jnp.mean(out["acc"])) > float(jnp.mean(out["acc_sdf"]))

    # is_nerf keeps the reference semantics (total acc)
    out_nerf = renderer.train_outputs(params, b, jax.random.PRNGKey(0),
                                      step=jnp.asarray(100))
    np.testing.assert_allclose(float(out_nerf["loss_mask"]),
                               float(jnp.mean(out_nerf["acc"])), rtol=1e-5)
