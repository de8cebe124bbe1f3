"""Score a trained shell-mode stage-2 checkpoint against the analytic GT.

The hollow-glass scene (synth_nested.py, --shell) has known IoR and shell
thickness; under the reference maps (eta = 1/(x + 0.6), renderer.py:1727;
thickness = x * 0.01, :1741) the net-output targets are
x_ior = IOR - 0.6 and x_thick = tau / 0.01.  Prints one JSON line with the
learned surface means and their absolute errors.
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
    ap.add_argument("--meta", required=True)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from nunerf_tpu.config import load_cfg
    from nunerf_tpu.fields.aux import IoRNetwork, ThicknessNetwork
    from nunerf_tpu.train.trainer import load_checkpoint

    cfg = load_cfg(args.cfg)
    meta = json.load(open(args.meta))
    ckpt = args.ckpt or os.path.join("data/model", cfg["name"], "model.ckpt")
    _, params, _, _ = load_checkpoint(ckpt)
    train = params["train"]

    # evaluate the fields where they matter: on the GT outer surface
    rs = np.random.RandomState(0)
    v = rs.randn(4096, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray(meta["r_outer"] * v, jnp.float32)

    ior_x = np.asarray(IoRNetwork().apply(train["ior"], pts))
    thick_x = np.asarray(ThicknessNetwork().apply(train["thickness"], pts))

    ior_offset = cfg.get("ior_offset", 0.6)
    thickness_scale = cfg.get("thickness_scale", 0.01)
    learned_ior = float(ior_x.mean()) + ior_offset
    learned_tau = float(thick_x.mean()) * thickness_scale

    out = {
        "learned_ior": learned_ior,
        "gt_ior": meta["ior"],
        "ior_abs_err": abs(learned_ior - meta["ior"]),
        "learned_thickness": learned_tau,
        "gt_thickness": meta.get("tau"),
        "thickness_abs_err": (abs(learned_tau - meta["tau"])
                              if "tau" in meta else None),
        "ior_field_std": float(ior_x.std()),
        "thickness_field_std": float(thick_x.std()),
    }

    if "absorption" in train:
        # learned Beer-Lambert kappa (round 5).  GT kappa is recorded per
        # CANONICAL world unit (tools/synth_nested.py); the renderer's chords
        # live in the normalized database frame for colmap scenes, so the
        # comparable GT is kappa / norm_scale.
        kappa = np.asarray(jnp.asarray(train["absorption"]))
        kappa = np.log1p(np.exp(kappa))  # softplus, matches stage2.render
        out["learned_kappa"] = [float(k) for k in kappa]
        if "glass_kappa" in meta:
            ns = meta.get("norm_scale", 1.0)
            out["gt_kappa_normalized"] = [float(k) / ns
                                          for k in meta["glass_kappa"]]

    print(json.dumps(out))
    os.makedirs("runs", exist_ok=True)
    out_fp = os.path.join("runs", f"eval_shell_{cfg['name']}.json")
    with open(out_fp, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_fp}")


if __name__ == "__main__":
    main()
