"""Capture a jax.profiler trace of the stage-1 bench step and extract
MEASURED device utilization (VERDICT r4 item 2b: "settle the throughput
question with measurements, not analysis").

Runs the exact bench.py contract (1024 rays, scan-chunked train step) on the
attached device, wraps one steady-state chunk in ``jax.profiler.trace``, then
parses the xplane with tensorboard_plugin_profile to report:
  - device duty cycle
  - MXU utilization (measured flop rate / peak)
  - HBM bandwidth utilization
Writes runs/prof_trace.json + the raw tool JSONs next to the trace dir.

Usage: python tools/prof_trace.py [logdir]
"""
import glob
import json
import os
import sys
import time

import numpy as np


def build_step(rn: int = 1024, chunk: int = 50):
    import jax
    import jax.numpy as jnp
    import optax

    from bench import BENCH_CFG
    from nunerf_tpu.models.stage1 import ShapeRenderer
    from nunerf_tpu.train.loss import compute_losses

    cfg = dict(BENCH_CFG, train_ray_num=rn)
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
             "near": jnp.full((rn, 1), 0.8), "far": jnp.full((rn, 1), 4.5),
             "rgbs": jnp.asarray(rs.rand(rn, 3), jnp.float32),
             "masks": jnp.ones((rn,))}

    def loss_fn(p, rng, step):
        outputs = renderer.train_outputs(p, batch, rng, step)
        return compute_losses(outputs, batch, step, renderer.cfg)["loss_total"]

    def one(p, s, rng, step):
        g = jax.grad(loss_fn)(p, rng, step)
        up, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, up), s

    def chunked(p, s, rng):
        def body(carry, i):
            return one(*carry, jax.random.fold_in(rng, i),
                       jnp.asarray(25000, jnp.int32)), None
        (p, s), _ = jax.lax.scan(body, (p, s), jnp.arange(chunk))
        return p, s

    f = jax.jit(chunked, donate_argnums=(0, 1))
    return f, params, opt_state


def parse_trace(logdir: str) -> dict:
    """Extract utilization numbers from the captured xplane via
    tensorboard_plugin_profile (best-effort across proto versions: dump the
    overview-page JSON and scan it for utilization/bandwidth fields)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return {"error": f"no xplane.pb under {logdir}"}
    out = {"xplane": paths[-1]}
    for tool in ("overview_page^", "op_profile^"):
        try:
            data, _ = rttd.xspace_to_tool_data([paths[-1]], tool, {})
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            fp = os.path.join("runs", f"prof_{tool.rstrip('^')}.json")
            with open(fp, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            out[tool.rstrip("^")] = fp
        except Exception as e:  # tool availability differs per tbp version
            out[tool.rstrip("^") + "_error"] = f"{type(e).__name__}: {e}"

    # scan the overview page for the utilization fields (schema is a nested
    # list-of-dicts "data table"; walk it generically)
    fp = out.get("overview_page")
    if fp:
        try:
            blob = json.load(open(fp))

            def walk(node, found):
                if isinstance(node, dict):
                    for k, v in node.items():
                        kl = str(k).lower()
                        if isinstance(v, (str, int, float)) and any(
                                s in kl for s in
                                ("util", "bandwidth", "duty", "flop_rate",
                                 "mxu")):
                            found[k] = v
                        else:
                            walk(v, found)
                elif isinstance(node, list):
                    for v in node:
                        walk(v, found)

            found = {}
            walk(blob, found)
            out["fields"] = found
        except Exception as e:
            out["fields_error"] = f"{type(e).__name__}: {e}"
    return out


def main():
    import jax

    logdir = sys.argv[1] if len(sys.argv) > 1 else "runs/prof_trace"
    os.makedirs(logdir, exist_ok=True)
    f, params, opt_state = build_step()

    # compile + warm
    params, opt_state = f(params, opt_state, jax.random.PRNGKey(1))
    jax.tree.map(lambda x: x.block_until_ready(), params)

    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        params, opt_state = f(params, opt_state, jax.random.PRNGKey(2))
        jax.tree.map(lambda x: x.block_until_ready(), params)
    dt = time.perf_counter() - t0

    result = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "traced_chunk_s": round(dt, 3),
              "step_ms": round(dt / 50 * 1e3, 2)}
    result.update(parse_trace(logdir))
    os.makedirs("runs", exist_ok=True)
    with open("runs/prof_trace.json", "w") as fjs:
        json.dump(result, fjs, indent=1, default=str)
    print(json.dumps(result, indent=1, default=str))


if __name__ == "__main__":
    main()
