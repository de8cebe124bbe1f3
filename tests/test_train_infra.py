"""Training infrastructure tests: chamfer, checkpoint/resume, golden steps,
LR schedule."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunerf_tpu.ops.chamfer import chamfer_distance, chamfer_distance_np
from nunerf_tpu.train.lr import warm_up_cos_schedule


def test_chamfer_identity_and_offset():
    rs = np.random.RandomState(0)
    a = rs.randn(500, 3).astype(np.float32)
    d1, d2 = chamfer_distance(a, a, tile=128)
    np.testing.assert_allclose(float(d1), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(d2), 0.0, atol=1e-5)

    # known offset: dense cloud b = a + [eps,0,0] -> chamfer ~ 2*eps^2 upper
    b = a + np.array([0.01, 0, 0], np.float32)
    total = chamfer_distance_np(a, b)
    assert total <= 2 * 0.01**2 + 1e-6
    assert total > 0

    # brute-force numpy cross-check on a small instance
    a2, b2 = a[:50], b[:64]
    d = np.linalg.norm(a2[:, None] - b2[None], axis=-1) ** 2
    expected = d.min(1).mean() + d.min(0).mean()
    d1, d2 = chamfer_distance(a2, b2, tile=32)
    np.testing.assert_allclose(float(d1) + float(d2), expected, rtol=1e-4)


def test_warm_up_cos_schedule_matches_reference():
    """Values per train/lr_common_manager.py:36-46."""
    sched = warm_up_cos_schedule(lr=5e-4, end_warm=5000, end_iter=300000)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(2500)), 5e-4 * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(5000)), 5e-4 * 1.0, rtol=1e-5)
    # end: factor -> alpha = 0.05
    np.testing.assert_allclose(float(sched(300000)), 5e-4 * 0.05, rtol=1e-4)
    # midpoint of cosine: (cos(pi/2)+1)/2*(0.95)+0.05
    mid = 5000 + (300000 - 5000) / 2
    np.testing.assert_allclose(float(sched(mid)), 5e-4 * (0.5 * 0.95 + 0.05),
                               rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    import optax
    from nunerf_tpu.train.trainer import save_checkpoint, load_checkpoint

    params = {"a": jnp.arange(5, dtype=jnp.float32),
              "b": {"c": jnp.ones((2, 3))}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, 123, params, opt_state, 31.5)

    step, p2, os2, best = load_checkpoint(path, opt_state)
    assert step == 123 and best == 31.5
    np.testing.assert_allclose(np.asarray(p2["a"]), np.arange(5))
    # optimizer state structure restored
    chex_flat1 = jax.tree_util.tree_leaves(opt_state)
    chex_flat2 = jax.tree_util.tree_leaves(os2)
    assert len(chex_flat1) == len(chex_flat2)


@pytest.mark.slow  # ~100s; trainer roundtrip/resume tests drive the same step
def test_golden_steps_deterministic():
    """Same seed + same data -> identical loss trajectory (SURVEY item e)."""
    import optax
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.loss import compute_losses

    cfg = {"name": "golden", "is_nerf": True, "get_mask": False,
           "shader_config": {"sphere_direction": False},
           "loss": ["nerf_render", "eikonal", "std"],
           "n_samples": 8, "n_bg_samples": 4, "n_importance": 4,
           "up_sample_steps": 1, "apply_occ_loss": False}

    def run():
        renderer = ShapeRenderer(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        rs = np.random.RandomState(0)
        o = np.tile(np.array([[0, 0, -2.5]], np.float32), (32, 1))
        t = rs.randn(32, 3).astype(np.float32) * 0.3
        d = (t - o) / np.linalg.norm(t - o, axis=-1, keepdims=True)
        batch = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
                 "near": jnp.full((32, 1), 0.8), "far": jnp.full((32, 1), 4.5),
                 "rgbs": jnp.asarray(rs.rand(32, 3).astype(np.float32)),
                 "masks": jnp.ones((32,))}

        @jax.jit
        def step_fn(params, opt_state, rng, step):
            def loss_fn(p):
                out = renderer.train_outputs(p, batch, rng, step)
                return compute_losses(out, batch, step, renderer.cfg)["loss_total"]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = jax.random.PRNGKey(7)
        losses = []
        for i in range(5):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step_fn(params, opt_state, sub,
                                              jnp.asarray(i, jnp.int32))
            losses.append(float(loss))
        return losses

    l1, l2 = run(), run()
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_eval_images_full_test_split(tmp_path, monkeypatch, capsys):
    """`eval-images --split test` must render EVERY blender test frame
    (testskip=1 reload) and emit a per-view PSNR/SSIM table + JSON — the
    reference's fixed-split evaluation (dataset/database.py:667-679), not a
    1-view validation probe."""
    import json as _json

    from scene_utils import make_test_scene
    from nunerf_tpu import cli

    root = tmp_path / "datasets"
    make_test_scene(str(root / "tiny_eval"), n_train=3, n_test=2, h=16, w=16)
    cfg = {
        "name": "tiny_eval", "network": "shape",
        "database_name": "nerf/tiny_eval", "is_nerf": True,
        "zero_thickness": True, "get_mask": False,
        "shader_config": {"sphere_direction": False, "human_light": False},
        "loss": ["nerf_render", "eikonal", "std"],
        "key_metric_name": "psnr", "apply_occ_loss": False,
        "n_samples": 8, "n_bg_samples": 4, "n_importance": 4,
        "n_front_samples": 4, "n_back_samples": 4,
        "up_sample_steps": 2, "train_ray_num": 32, "test_ray_num": 64,
        "anneal_end": 100, "dataset_dir": str(root),
        "total_step": 1, "val_interval": 10, "save_interval": 10,
        "model_dir": str(tmp_path / "model"),
    }
    import yaml
    cfg_path = tmp_path / "tiny_eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)
    cli.main(["eval-images", "--cfg", str(cfg_path), "--split", "test"])
    out = capsys.readouterr().out
    assert "mean psnr" in out

    res = _json.loads((tmp_path / "data/eval/tiny_eval/eval_test.json")
                      .read_text())
    # make_test_scene writes 2 test frames; testskip must not drop any
    assert len(res["views"]) == 2
    assert np.isfinite(res["mean_psnr"]) and np.isfinite(res["mean_ssim"])
