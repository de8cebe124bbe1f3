"""Carving diagnostics for a stage-2 checkpoint, cheap enough for CPU.

Scores the inner SDF directly against the analytic GT surface samples
(no marching-cubes extraction needed), so the 60k nested run's carving
trajectory can be watched mid-flight without touching the TPU:

* sdf_on_gt: inner-SDF stats on GT inner-surface points (goal: -> 0);
* concave probe: SDF at the snowman neck crease band — the round-3 blob
  bridged exactly here (docs/nested_walkthrough.md: gt->pred 0.050);
* sign coverage: fraction of GT points whose outward offset is positive
  and inward offset negative (a correctly-signed zero crossing nearby);
* inv_s and IoR/thickness field means.

Usage: JAX_PLATFORMS=cpu python tools/diag_inner.py --cfg configs/stage2/nerf/nested.yaml \
           [--ckpt data/model/nested_s2/model.ckpt] [--gt datasets/nested/gt_inner.npy]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--eps", type=float, default=0.02)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.fields.sdf import SDFNetwork
    from nunerf_tpu.fields.variance import SingleVarianceNetwork
    from nunerf_tpu.train.trainer import load_checkpoint

    cfg = load_cfg(args.cfg)
    name = cfg["name"]
    ckpt = args.ckpt or os.path.join("data/model", name, "model.ckpt")
    gt_path = args.gt or os.path.join(
        cfg.get("dataset_dir", "./datasets"),
        cfg["database_name"].split("/")[-1], "gt_inner.npy")
    step, params, _, _ = load_checkpoint(ckpt)
    train = params["train"]

    sdf_net = SDFNetwork(
        bias=cfg.get("sdf_bias", 0.5),
        dtype=(jnp.bfloat16 if cfg.get("sdf_mixed_precision") else None))
    var_net = SingleVarianceNetwork(init_val=cfg.get("inv_s_init", 0.3),
                                    activation=cfg.get("std_act", "exp"))

    gt = np.load(gt_path)
    rs = np.random.RandomState(0)
    pick = rs.choice(len(gt), min(args.n, len(gt)), replace=False)
    pts = gt[pick].astype(np.float32)

    def sdf(x):
        return np.asarray(sdf_net.apply(train["sdf_inner"],
                                        jnp.asarray(x))[..., 0])

    # surface normals from GT point offsets: approximate outward direction
    # by the direction away from the local centroid of the GT cloud
    center = pts.mean(0, keepdims=True)
    out_dir = pts - center
    out_dir /= np.linalg.norm(out_dir, axis=-1, keepdims=True) + 1e-8

    s0 = sdf(pts)
    s_out = sdf(pts + args.eps * out_dir)
    s_in = sdf(pts - args.eps * out_dir)
    signed_ok = (s_out > s0) & (s_in < s0)
    crossing = (s_out > 0) & (s_in < 0)

    # concave probe: the neck crease band of the snowman (two spheres at
    # z ~ -0.07 r .22 and z ~ .21 r .15 in synth_nested.py -> crease near
    # z ~ 0.1); probe a thin ring just inside the crease
    band = pts[np.abs(pts[:, 2] - 0.10) < 0.04]
    s_band = sdf(band) if len(band) else np.array([np.nan])

    inv_s = float(np.asarray(var_net.apply(train["var_inner"],
                                           jnp.zeros((1, 3)))[0, 0]))
    out = {
        "step": int(step),
        "sdf_on_gt_mean": float(s0.mean()),
        "sdf_on_gt_absmean": float(np.abs(s0).mean()),
        "sdf_on_gt_p90_abs": float(np.percentile(np.abs(s0), 90)),
        "monotone_frac": float(signed_ok.mean()),
        "zero_crossing_frac": float(crossing.mean()),
        "neck_band_sdf_mean": float(np.nanmean(s_band)),
        "neck_band_n": int(len(band)),
        "inv_s": inv_s,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
