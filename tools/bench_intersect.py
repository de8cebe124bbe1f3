"""Closest-hit throughput: brute-force MT sweep vs tile-culled descent.

VERDICT round-1 acceptance: closest-hit at >=1M triangles within ~2x of the
83k-triangle time (the reference's 4-wide CUDA BVH makes large meshes ~free;
raytracing/src/bvh.cu:255-301).

Run on the TPU:  python tools/bench_intersect.py [--rays 4096]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_mesh(n_subdiv):
    """Icosphere-ish mesh by marching a sphere SDF at increasing resolution."""
    from nunerf_tpu.tracing.mesh_ops import extract_geometry

    def sdf(p):
        # lumpy sphere so tiles aren't degenerate
        r = np.linalg.norm(p, axis=-1)
        return r - (0.5 + 0.05 * np.sin(7 * p[..., 0]) * np.cos(7 * p[..., 1]))

    return extract_geometry(sdf, resolution=n_subdiv, bound=1.0)


def bench(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--resolutions", type=int, nargs="+",
                    default=[128, 256, 512])
    args = ap.parse_args()

    import jax
    from nunerf_tpu.tracing.intersect import (
        auto_tile_params, build_tile_index, pad_triangles,
        ray_mesh_intersect, ray_mesh_intersect_culled)

    rs = np.random.RandomState(0)
    o = rs.uniform(-1.5, 1.5, (args.rays, 3)).astype(np.float32)
    d = rs.normal(size=o.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    rows = []
    for res in args.resolutions:
        verts, tris = make_mesh(res)
        nt = len(tris)
        v0, e1, e2 = pad_triangles(verts, tris, 2048)
        t_brute = bench(ray_mesh_intersect, o, d, v0, e1, e2) if nt < 2_000_000 else float("nan")
        tile, group = auto_tile_params(nt)   # the law Scene uses (round 5)
        idx = build_tile_index(verts, tris, tile=tile, group=group)
        from functools import partial as _partial
        t_cull = bench(_partial(ray_mesh_intersect_culled, group=group), o, d, idx)
        # correctness spot check
        h_b = ray_mesh_intersect(np.ascontiguousarray(o[:256]),
                                 np.ascontiguousarray(d[:256]), v0, e1, e2)
        h_c = ray_mesh_intersect_culled(o[:256], d[:256], idx, group=group)
        ok = bool(np.allclose(np.asarray(h_b.t), np.asarray(h_c.t),
                              rtol=1e-6, atol=1e-6))
        rows.append((nt, t_brute * 1e3, t_cull * 1e3, ok))
        print(f"tris={nt:>9}  brute={t_brute * 1e3:8.2f} ms  "
              f"culled={t_cull * 1e3:8.2f} ms  match={ok}", flush=True)

    if len(rows) >= 2 and rows[0][2] > 0:
        print(f"culled scaling {rows[0][0]} -> {rows[-1][0]} tris: "
              f"{rows[-1][2] / rows[0][2]:.2f}x time "
              f"({rows[-1][0] / rows[0][0]:.0f}x triangles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
