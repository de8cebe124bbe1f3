"""Diagnose stage-2 background radiance vs stage-1 on the nested scene.

Renders the held-out view with (a) the frozen stage-1 renderer and (b) the
stage-2 renderer (round-2 checkpoint), splits pixels into glass-silhouette vs
background regions, and reports per-region PSNR plus stage-1's background
`acc` (how much of the white background is the is_nerf (1-acc) fill that
stage-2 never adds).
"""
import numpy as np
import jax
import jax.numpy as jnp

from nunerf_tpu.config import load_cfg
from nunerf_tpu.data.database import parse_database_name, get_database_split
from nunerf_tpu.data.ray_store import build_imgs_info, construct_nerf_ray_batch
from nunerf_tpu.train.trainer import load_checkpoint
from nunerf_tpu.models.stage1 import ShapeRenderer
from nunerf_tpu.models.stage2 import Stage2Renderer


def chunked(render_fn, params, batch, trn=1024):
    rn = batch["rays_o"].shape[0]
    outs = []
    rng = jax.random.PRNGKey(0)
    for i0 in range(0, rn, trn):
        cur = {k: v[i0:i0 + trn] for k, v in batch.items()}
        if cur["rays_o"].shape[0] < trn:
            pad = trn - cur["rays_o"].shape[0]
            cur = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)], 0)
                   for k, v in cur.items()}
        o = render_fn(params, {k: jnp.asarray(v) for k, v in cur.items()},
                      rng, jnp.asarray(30000, jnp.int32))
        outs.append(jax.device_get(o))
    res = {}
    for k in outs[0]:
        v = np.concatenate([np.atleast_1d(np.asarray(c[k])) for c in outs], 0)
        res[k] = v[:rn]
    return res


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def main():
    db = parse_database_name("nerf/nested", "./datasets")
    _, test_ids = get_database_split(db)
    info = build_imgs_info(db, test_ids[:1], with_mask=True)
    batch, h, w = construct_nerf_ray_batch(info)
    gt = batch["rgbs"].reshape(h, w, 3)
    mask = batch["masks"].reshape(h, w) > 0.5 if "masks" in batch else None

    cfg1 = load_cfg("configs/shape/nerf/nested.yaml")
    _, p1, _, _ = load_checkpoint("data/model/nested/model_best.ckpt")
    r1 = ShapeRenderer(cfg1)
    f1 = jax.jit(r1.test_outputs)
    out1 = chunked(f1, p1, batch)
    img1 = out1["ray_rgb"].reshape(h, w, 3)

    cfg2 = load_cfg("configs/stage2/nerf/nested.yaml")
    r2 = Stage2Renderer(cfg2)
    _, p2, _, _ = load_checkpoint("data/model/nested_s2/model_best.ckpt")
    f2 = jax.jit(r2.test_outputs)
    out2 = chunked(f2, p2, batch)
    img2 = out2["ray_rgb"].reshape(h, w, 3)

    # glass silhouette from the ray tracer itself: bounce-0 hit mask
    hits = []
    for i0 in range(0, batch["rays_o"].shape[0], 4096):
        o = batch["rays_o"][i0:i0 + 4096]
        d = batch["rays_d"][i0:i0 + 4096]
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        res = r2.scene.dintersect(jnp.asarray(o), jnp.asarray(d))
        hits.append(np.asarray(res["hit"]))
    hit = np.concatenate(hits, 0)[: h * w].reshape(h, w)

    bg = ~hit
    print(f"view {test_ids[0]}  {h}x{w}, glass fraction {hit.mean():.3f}")
    print(f"stage1 PSNR full {psnr(gt, img1):.2f}  glass "
          f"{psnr(gt[hit], img1[hit]):.2f}  bg {psnr(gt[bg], img1[bg]):.2f}")
    print(f"stage2 PSNR full {psnr(gt, img2):.2f}  glass "
          f"{psnr(gt[hit], img2[hit]):.2f}  bg {psnr(gt[bg], img2[bg]):.2f}")
    acc1 = out1["acc"].reshape(h, w)
    print(f"stage1 acc on bg: mean {acc1[bg].mean():.3f}  "
          f"(white fill carries {1 - acc1[bg].mean():.3f} of bg radiance)")
    print(f"gt bg mean rgb {gt[bg].mean(0)}  s1 bg {img1[bg].mean(0)}  "
          f"s2 bg {img2[bg].mean(0)}")
    print(f"gt glass mean rgb {gt[hit].mean(0)}  s1 {img1[hit].mean(0)}  "
          f"s2 {img2[hit].mean(0)}")


if __name__ == "__main__":
    main()
