"""On-device ray synthesis: compute the per-step ray batch inside the jitted
train step from compact per-image tables.

The reference precomputes every ray of every training image as float tensors
and slices per step (``network/renderer.py:204-214,467-470``) — at 100 blender
views that is 64M rays x 96 B ≈ 6 GB resident.  Here the device store is just
the images (uint8), masks (uint8) and per-image pose/K tables (~25x smaller);
rays are synthesized from the selected flat pixel indices with a handful of
gathers and FLOPs per ray, which is free next to the render itself and keeps
HBM for activations.

``sample_rays(store, idx)`` reproduces ``construct_ray_batch`` /
``construct_nerf_ray_batch`` rows exactly (tested in
tests/test_device_rays.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from nunerf_tpu.data.ray_store import get_human_coordinate_poses


def build_compact_store(info: Dict[str, np.ndarray], is_nerf: bool,
                        fixed_camera: bool = False,
                        near: float = 0.8, far: float = 4.5
                        ) -> Dict[str, np.ndarray]:
    """Compact device-resident tables from ``build_imgs_info`` output.

    Keys: rgbs (imn,h,w,3 u8), masks (imn,h,w u8), poses / human_poses
    (imn,3,4 f32), Ks_inv (imn,3,3 f32), meta (static scalars folded into the
    arrays' shapes + an ``aux`` row of [is_nerf, fixed near, far]).
    """
    imgs, Ks, poses = info["imgs"], info["Ks"], info["poses"]
    imn, h, w = imgs.shape[:3]
    store = {
        "rgbs": np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8),
        "poses": poses.astype(np.float32),
        "Ks_inv": np.linalg.inv(Ks).astype(np.float32),
        "aux": np.array([float(is_nerf), near, far], np.float32),
    }
    if "masks" in info:
        store["masks"] = np.clip(info["masks"] * 255.0 + 0.5,
                                 0, 255).astype(np.uint8)
    if is_nerf:
        # blender poses are already the "human" frame slot
        # (renderer.py:391 returns poses[idxs])
        store["human_poses"] = poses.astype(np.float32)
    else:
        store["human_poses"] = get_human_coordinate_poses(poses, fixed_camera)
    return store


def num_rays(store: Dict[str, jnp.ndarray]) -> int:
    imn, h, w = store["rgbs"].shape[:3]
    return imn * h * w


def sample_rays(store: Dict[str, jnp.ndarray], idx: jnp.ndarray
                ) -> Dict[str, jnp.ndarray]:
    """Synthesize the standard ray batch for flat ray indices ``idx`` [R]
    (row-major over image, then y, then x) — jit-safe, all gathers."""
    imn, h, w = store["rgbs"].shape[:3]
    is_nerf = store["aux"][0] > 0.5

    img = idx // (h * w)
    pix = idx % (h * w)
    py = pix // w
    px = pix % w

    rgbs = store["rgbs"][img, py, px].astype(jnp.float32) / 255.0
    poses = store["poses"][img]  # [R,3,4]
    R_mat, t = poses[:, :, :3], poses[:, :, 3]
    xf = px.astype(jnp.float32)
    yf = py.astype(jnp.float32)

    # NeRO convention (construct_ray_batch): w2c pose, +0.5 pixel centers
    K_inv = store["Ks_inv"][img]
    coords = jnp.stack([xf + 0.5, yf + 0.5, jnp.ones_like(xf)], -1)
    dirs_nero = jnp.einsum("rij,rj->ri", K_inv, coords)
    d_nero = jnp.einsum("rji,rj->ri", R_mat, dirs_nero)  # R^T @ d
    d_nero = d_nero / jnp.maximum(
        jnp.linalg.norm(d_nero, axis=-1, keepdims=True), 1e-8)
    o_nero = -jnp.einsum("rji,rj->ri", R_mat, t)
    mid = -jnp.sum(o_nero * d_nero, -1, keepdims=True)
    near_nero = jnp.maximum(mid - 1.0, 1e-3)
    far_nero = mid + 1.0

    # blender convention (construct_nerf_ray_batch): c2w OpenGL pose; the
    # whole dataset shares K (renderer.py:244)
    K0_inv = store["Ks_inv"][0]
    fx, fy = 1.0 / K0_inv[0, 0], 1.0 / K0_inv[1, 1]
    cx, cy = -K0_inv[0, 2] * fx, -K0_inv[1, 2] * fy
    dirs_nerf = jnp.stack([(xf - cx) / fx, -(yf - cy) / fy,
                           -jnp.ones_like(xf)], -1)
    d_nerf = jnp.einsum("rij,rj->ri", R_mat, dirs_nerf)
    d_nerf = d_nerf / jnp.maximum(
        jnp.linalg.norm(d_nerf, axis=-1, keepdims=True), 1e-8)
    near_nerf = jnp.full_like(mid, store["aux"][1])
    far_nerf = jnp.full_like(mid, store["aux"][2])

    batch = {
        "rays_o": jnp.where(is_nerf, t, o_nero),
        "rays_d": jnp.where(is_nerf, d_nerf, d_nero),
        "near": jnp.where(is_nerf, near_nerf, near_nero),
        "far": jnp.where(is_nerf, far_nerf, far_nero),
        "rgbs": rgbs,
        "human_poses": store["human_poses"][img],
    }
    if "masks" in store:
        batch["masks"] = store["masks"][img, py, px].astype(jnp.float32) / 255.0
    return batch
