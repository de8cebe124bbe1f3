"""Stage-1 training throughput vs rays/step on the attached device.

The reference contract is 1024 rays/step, but rays/s is the metric — a
TPU-first design should batch up to the hardware's preferred operating
point (bigger matmuls on the MXU, fewer dispatches).  Prints one JSON line
per batch size.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZES = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]


def main():
    import jax

    from bench import run

    jax.config.update("jax_compilation_cache_dir", "data/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for rn in SIZES:
        try:
            out = run(rn_override=rn, quiet=True)
            print(json.dumps({"rays_per_step": rn,
                              "rays_per_sec": out["value"],
                              "step_ms": out["step_ms"]}), flush=True)
        except Exception as e:
            # e.g. the TPU compiler regalloc RET_CHECK certain shapes trip
            # (.claude/skills/verify: known 2048-ray-chunk pitfall) — record
            # and keep sweeping
            print(json.dumps({"rays_per_step": rn,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
