"""Bisect the stage-2 train-step compile hang on the tunneled TPU.

Stages: (1) jit the single train step; (2) the scan-chunked step at
CHUNK=10; (3) CHUNK=100 (the trainer's default train_log_step).
"""
import sys
import time

import numpy as np

CHUNKS = [int(a) for a in sys.argv[1:]] or [0, 10]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.models.stage2 import Stage2Renderer
    from nunerf_tpu.train.loss import compute_losses

    cfg = load_cfg("configs/stage2/nerf/nested.yaml")
    r = Stage2Renderer(cfg)
    params = r.init_params(jax.random.PRNGKey(0))
    opt = optax.multi_transform(
        {"train": optax.adam(5e-4), "frozen": optax.set_to_zero()},
        {"train": "train", "frozen": "frozen"})
    opt_state = opt.init(params)

    rn = r.cfg["train_ray_num"]
    rs = np.random.RandomState(0)
    o = np.tile(np.array([[0, 0, -2.5]], np.float32), (rn, 1))
    tg = rs.randn(rn, 3).astype(np.float32) * 0.3
    d = tg - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
             "rgbs": jnp.asarray(rs.rand(rn, 3), jnp.float32)}

    def loss_fn(p, rng, step):
        outputs = r.train_outputs(p, batch, rng, step)
        terms = compute_losses(outputs, batch, step, r.cfg)
        return terms["loss_total"]

    def one(p, s, rng, step):
        g = jax.grad(loss_fn)(p, rng, step)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    for chunk in CHUNKS:
        t0 = time.time()
        if chunk == 0:
            f = jax.jit(one)
            p2, s2 = f(params, opt_state, jax.random.PRNGKey(1),
                       jnp.asarray(10, jnp.int32))
            jax.tree.map(lambda x: x.block_until_ready(), p2["train"])
        else:
            def chunked(p, s, rng, step0):
                def body(carry, i):
                    p, s = carry
                    return one(*carry, jax.random.fold_in(rng, i), step0 + i), None
                (p, s), _ = jax.lax.scan(body, (p, s), jnp.arange(chunk))
                return p, s
            f = jax.jit(chunked)
            p2, s2 = f(params, opt_state, jax.random.PRNGKey(1),
                       jnp.asarray(10, jnp.int32))
            jax.tree.map(lambda x: x.block_until_ready(), p2["train"])
        print(f"chunk={chunk}: compile+run {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
