"""Stage-1 training throughput vs rays/step on the attached device.

The reference contract is 1024 rays/step, but rays/s is the metric — a
TPU-first design should batch up to the hardware's preferred operating
point (bigger matmuls on the MXU, fewer dispatches).  Prints one JSON line
per batch size.
"""
import json
import sys
import time

import numpy as np

SIZES = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import BENCH_CFG
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.loss import compute_losses

    jax.config.update("jax_compilation_cache_dir", "data/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for rn in SIZES:
        cfg = dict(BENCH_CFG, train_ray_num=rn, name=f"bench{rn}")
        renderer = ShapeRenderer(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0))
        optimizer = optax.adam(5e-4)
        opt_state = optimizer.init(params)

        rs = np.random.RandomState(0)
        o = np.tile(np.array([[0, 0, -2.5]], np.float32), (rn, 1))
        tg = rs.randn(rn, 3).astype(np.float32) * 0.3
        d = tg - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
                 "near": jnp.full((rn, 1), 0.8),
                 "far": jnp.full((rn, 1), 4.5),
                 "rgbs": jnp.asarray(rs.rand(rn, 3), jnp.float32),
                 "masks": jnp.ones((rn,))}

        def loss_fn(p, rng, step):
            outputs = renderer.train_outputs(p, batch, rng, step)
            return compute_losses(outputs, batch, step, renderer.cfg)["loss_total"]

        def one(p, s, rng, step):
            g = jax.grad(loss_fn)(p, rng, step)
            up, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, up), s

        # keep device work per dispatch roughly constant (~50k rays)
        chunk = max(4, 51200 // rn)

        def chunked(p, s, rng):
            def body(carry, i):
                return one(*carry, jax.random.fold_in(rng, i),
                           jnp.asarray(25000, jnp.int32)), None
            (p, s), _ = jax.lax.scan(body, (p, s), jnp.arange(chunk))
            return p, s

        f = jax.jit(chunked, donate_argnums=(0, 1))
        t0 = time.time()
        params, opt_state = f(params, opt_state, jax.random.PRNGKey(1))
        jax.tree.map(lambda x: x.block_until_ready(), params)
        compile_s = time.time() - t0

        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            params, opt_state = f(params, opt_state, jax.random.PRNGKey(2 + i))
        jax.tree.map(lambda x: x.block_until_ready(), params)
        dt = time.perf_counter() - t0
        rays_s = reps * chunk * rn / dt
        print(json.dumps({"rays_per_step": rn, "rays_per_sec": round(rays_s, 1),
                          "step_ms": round(dt / (reps * chunk) * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
