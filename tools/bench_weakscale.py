"""Weak-scaling harness: stage-1 sharded train-step time vs device count at
FIXED per-device rays (VERDICT r4 item 8).

Real multi-chip hardware is unavailable on this rig, so this runs on the
virtual CPU mesh (xla_force_host_platform_device_count) — it validates the
sharding CONTRACT (per-device work constant => step time ~flat, XLA inserts
one psum per step) and records the trend; ICI-limited efficiency numbers
must come from real chips.  Run:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_weakscale.py [rays_per_device]

Prints one JSON line per device count + a summary line; writes
runs/weakscale.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RAYS_PER_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import BENCH_CFG
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from nunerf_tpu.train.loss import compute_losses

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    rows = []
    for n in counts:
        mesh = make_mesh(n)
        rn = RAYS_PER_DEV * n
        cfg = dict(BENCH_CFG, train_ray_num=rn, name=f"ws{n}")
        renderer = ShapeRenderer(cfg)
        params = replicate(renderer.init_params(jax.random.PRNGKey(0)), mesh)
        optimizer = optax.adam(5e-4)
        opt_state = replicate(optimizer.init(params), mesh)

        rs = np.random.RandomState(0)
        o = np.tile(np.array([[0, 0, -2.5]], np.float32), (rn, 1))
        tg = rs.randn(rn, 3).astype(np.float32) * 0.3
        d = tg - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = shard_batch(
            {"rays_o": o, "rays_d": d.astype(np.float32),
             "near": np.full((rn, 1), 0.8, np.float32),
             "far": np.full((rn, 1), 4.5, np.float32),
             "rgbs": rs.rand(rn, 3).astype(np.float32),
             "masks": np.ones((rn,), np.float32)}, mesh)

        def loss_fn(p, rng, step):
            outputs = renderer.train_outputs(p, batch, rng, step)
            return compute_losses(outputs, batch, step,
                                  renderer.cfg)["loss_total"]

        def one(p, s, rng, step):
            g = jax.grad(loss_fn)(p, rng, step)
            up, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, up), s

        chunk = 4

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
        step_ms = dt / (reps * chunk) * 1e3
        rows.append({"devices": n, "rays_per_step": rn,
                     "step_ms": round(step_ms, 2),
                     "rays_per_sec": round(reps * chunk * rn / dt, 1),
                     "compile_s": round(compile_s, 1)})
        print(json.dumps(rows[-1]), flush=True)

    if rows:
        base = rows[0]["step_ms"]
        for r in rows:
            # weak-scaling efficiency: 1-device step time / n-device step
            # time at n x the total work
            r["weak_efficiency"] = round(base / r["step_ms"], 3)
    summary = {"platform": jax.devices()[0].platform,
               "rays_per_device": RAYS_PER_DEV, "rows": rows}
    os.makedirs("runs", exist_ok=True)
    with open("runs/weakscale.json", "w") as fjs:
        json.dump(summary, fjs, indent=1)
    print(json.dumps({"weak_efficiency_at_max": rows[-1]["weak_efficiency"],
                      "devices_max": rows[-1]["devices"]}))


if __name__ == "__main__":
    main()
