"""Head-level A/B of the shading-predictor fwd+bwd: XLA vs fused Pallas
kernel under each dW strategy (NUNERF_FUSED_BWD=accum|partial).

Times one 4-layer 256-wide predictor chain (the shading stack's unit,
reference network/field.py:371-408) at the stage-1 step's point count with
varying inputs inside a lax.scan (honest: defeats CSE, amortizes dispatch).

Usage (on the TPU):  python tools/prof_fused.py [n_points]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_variant(label, chain_fn, n, d_in, flat, scan_len=20, reps=3):
    import jax
    import jax.numpy as jnp

    def loss(x, flat):
        return jnp.sum(chain_fn(x, *flat) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    def chunk(x0, flat):
        def body(carry, i):
            x = x0 + 1e-4 * i           # varying input each iteration
            dx, dflat = grad(x, carry)
            new = jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b,
                                         carry, dflat)
            return new, jnp.sum(dx)

        flat2, sums = jax.lax.scan(body, flat, jnp.arange(scan_len))
        return flat2, sums[-1]

    jitted = jax.jit(chunk)
    x0 = jnp.asarray(np.random.RandomState(0).randn(n, d_in), jnp.float32)
    flat = tuple(jnp.asarray(f) for f in flat)
    out, s = jitted(x0, flat)
    float(s)                            # force full execution (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, s = jitted(x0, out)
        float(s)
    dt = time.perf_counter() - t0
    ms = dt / (reps * scan_len) * 1e3
    print(json.dumps({"variant": label, "ms_per_call": round(ms, 3),
                      "n_points": n}), flush=True)
    return ms


def main():
    import jax.numpy as jnp

    from nunerf_tpu.ops.fused_mlp import (ChainSpec, chain_mlp_reference,
                                          fused_chain_mlp)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    d_in, width, d_out = 259, 256, 3    # materials-head geometry
    dims = (d_in, width, width, width, d_out)
    rs = np.random.RandomState(1)
    shapes = list(zip(dims[:-1], dims[1:]))
    flat = ([rs.randn(*s).astype(np.float32) * 0.05 for s in shapes]
            + [rs.randn(1, d).astype(np.float32) * 0.01 for d in dims[1:]])
    spec = ChainSpec(dims, ("relu", "relu", "relu", "none"), (False,) * 4,
                     (1.0,) * 4, compute_dtype="bfloat16")

    results = {}
    results["xla"] = time_variant(
        "xla", lambda x, *f: chain_mlp_reference(spec, x, *f),
        n, d_in, flat)
    for mode in ("accum", "partial"):
        os.environ["NUNERF_FUSED_BWD"] = mode
        results[f"fused_{mode}"] = time_variant(
            f"fused_{mode}", lambda x, *f: fused_chain_mlp(spec, x, *f),
            n, d_in, flat)
    best = min(results, key=results.get)
    print(json.dumps({"best": best, "ms": {k: round(v, 3)
                                           for k, v in results.items()}}))


if __name__ == "__main__":
    main()
