"""Ad-hoc stage-1 throughput profiler: run the bench step under cfg overrides.

Usage: python tools/prof_stage1.py '{"sdf_mixed_precision": true}' ...
Each positional arg is a JSON dict of cfg overrides; prints rays/s for each.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(overrides):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import BENCH_CFG
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from nunerf_tpu.train.loss import compute_losses

    cfg = {**BENCH_CFG, **overrides}
    mesh = make_mesh()
    renderer = ShapeRenderer(cfg)
    params = jax.device_put(renderer.init_params(jax.random.PRNGKey(0)),
                            replicated(mesh))
    optimizer = optax.adam(5e-4)
    opt_state = jax.device_put(optimizer.init(params), replicated(mesh))

    rn = cfg["train_ray_num"]
    rs = np.random.RandomState(0)
    origins = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (rn, 1))
    targets = rs.randn(rn, 3).astype(np.float32) * 0.3
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = shard_batch({
        "rays_o": origins, "rays_d": dirs.astype(np.float32),
        "near": np.full((rn, 1), 0.8, np.float32),
        "far": np.full((rn, 1), 4.5, np.float32),
        "rgbs": rs.rand(rn, 3).astype(np.float32),
        "masks": np.ones((rn,), np.float32),
    }, mesh)

    def loss_fn(params, batch, rng, step):
        outputs = renderer.train_outputs(params, batch, rng, step)
        terms = compute_losses(outputs, batch, step, renderer.cfg)
        return terms["loss_total"], terms

    def train_step(params, opt_state, batch, rng, step):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng, step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    CHUNK = 50

    def train_chunk(params, opt_state, batch, rng, step0):
        def body(carry, i):
            p, s = carry
            r = jax.random.fold_in(rng, i)
            p, s, loss = train_step(p, s, batch, r, step0 + i)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(CHUNK))
        return params, opt_state, losses[-1]

    jitted = jax.jit(train_chunk, donate_argnums=(0, 1))
    step = jnp.asarray(25000, jnp.int32)
    rng = jax.random.PRNGKey(1)

    rng, sub = jax.random.split(rng)
    params, opt_state, loss = jitted(params, opt_state, batch, sub, step)
    float(loss)

    n_chunks = 4
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = jitted(params, opt_state, batch, sub, step)
    lossv = float(loss)
    dt = time.perf_counter() - t0
    rays = n_chunks * CHUNK * rn / dt
    ms = dt / (n_chunks * CHUNK) * 1000
    print(json.dumps({"overrides": overrides, "rays_per_sec": round(rays, 1),
                      "step_ms": round(ms, 2), "loss": lossv}), flush=True)


if __name__ == "__main__":
    variants = [json.loads(a) for a in sys.argv[1:]] or [{}]
    for v in variants:
        run_variant(v)
