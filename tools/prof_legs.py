"""Per-component stage-1 leg timing on the attached device.

Each leg runs inside a lax.scan with per-iteration-varying inputs (prevents
loop-invariant hoisting) and the result is fetched (tunnel-safe timing).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    def chunk(args):
        def body(_, i):
            return None, fn(i, *args)
        _, out = jax.lax.scan(body, None, jnp.arange(iters))
        return jax.tree.map(lambda x: x[-1].sum() if hasattr(x, "sum") else x, out)

    j = jax.jit(chunk)
    r = j(args)
    jax.tree.map(lambda x: float(x), r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = j(args)
    jax.tree.map(lambda x: float(x), r)
    dt = (time.perf_counter() - t0) / (3 * iters)
    print(json.dumps({"leg": name, "ms": round(dt * 1000, 2)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import BENCH_CFG
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.ops.sampling import get_intersection

    cfg = {**BENCH_CFG, "sdf_mixed_precision": True}
    renderer = ShapeRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))

    rn, sn = 1024, 160
    N = rn * sn
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(N, 3).astype(np.float32) * 0.5)
    dirs = jnp.asarray(rs.randn(N, 3).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dists = jnp.full((N,), 0.01, jnp.float32)
    feats = jnp.asarray(rs.randn(N, 256).astype(np.float32))

    origins = jnp.tile(jnp.array([[0.0, 0.0, -2.5]], jnp.float32), (rn, 1))
    tg = jnp.asarray(rs.randn(rn, 3).astype(np.float32) * 0.3)
    rd = (tg - origins) / jnp.linalg.norm(tg - origins, axis=-1, keepdims=True)
    near = jnp.full((rn, 1), 0.8)
    far = jnp.full((rn, 1), 4.5)

    # 1. hierarchical sampling (no grad)
    def leg_sample(i, params):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
        z = renderer.sample_ray(params, origins, rd, near, far, 1.0, rng)
        return z.sum()
    timed("sample_ray", leg_sample, params)

    # 2. sdf_all fwd+bwd at N pts
    def leg_sdf(i, params, pts):
        p2 = pts + i * 1e-6
        def loss(params):
            sdf, f, g = renderer.sdf_all(params, p2)
            return jnp.sum(sdf) + jnp.sum(f * 1e-3) + jnp.sum(g * 1e-3)
        l, gr = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))
    timed("sdf_all fwd+bwd", leg_sdf, params, pts)

    # 3. shading fwd+bwd at N pts
    def leg_shade(i, params, pts, dirs, feats):
        p2 = pts + i * 1e-6
        def loss(params):
            color, info = renderer.color_net.apply(
                params["shade"], p2, dirs, -dirs, feats, None)
            return jnp.sum(color) + jnp.sum(info["occ_prob"] * 1e-3)
        l, gr = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))
    timed("shading fwd+bwd", leg_shade, params, pts, dirs, feats)

    # 4. nerf background fwd+bwd at N pts
    def leg_nerf(i, params, pts, dirs, dists):
        p2 = pts + i * 1e-6
        def loss(params):
            a, c = renderer.compute_density_alpha(params, p2, dists, dirs)
            return jnp.sum(a) + jnp.sum(c)
        l, gr = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))
    timed("nerf fwd+bwd", leg_nerf, params, pts, dirs, dists)

    # 5. occ march (no grad), 2048 pts
    k = cfg["occ_loss_max_pn"]
    def leg_occ(i, params, pts, dirs):
        p2 = pts[:k] * 0.3 + i * 1e-6
        sdf_fn = lambda x: renderer.sdf(params, x)
        inv_fn = lambda x: renderer.inv_s(params, x)
        _, prob, _ = get_intersection(sdf_fn, inv_fn, p2, dirs[:k], sn0=64, sn1=16)
        return jnp.sum(prob)
    timed("occ march", leg_occ, params, pts, dirs)

    # 6. sdf fwd+bwd at the PARTITIONED count (128/ray)
    def leg_sdf_small(i, params, pts):
        p2 = pts[: rn * 128] + i * 1e-6
        def loss(params):
            sdf, f, g = renderer.sdf_all(params, p2)
            return jnp.sum(sdf) + jnp.sum(f * 1e-3) + jnp.sum(g * 1e-3)
        l, gr = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))
    timed("sdf_all fwd+bwd 128/ray", leg_sdf_small, params, pts)


if __name__ == "__main__":
    main()
