"""Synthetic blender-format test scene: an analytically ray-traced sphere.

Produces a tiny ``transforms_{train,test}.json`` dataset so the data layer
and trainers can run end-to-end without external assets.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


def look_at_pose(cam_pos: np.ndarray) -> np.ndarray:
    """c2w for an OpenGL camera at ``cam_pos`` looking at the origin."""
    forward = -cam_pos / np.linalg.norm(cam_pos)  # view direction (-z axis)
    z_axis = -forward
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, z_axis)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    x_axis = np.cross(up, z_axis)
    x_axis /= np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_axis, y_axis, z_axis, cam_pos
    return c2w


def render_sphere_view(c2w: np.ndarray, h: int, w: int, focal: float,
                       radius: float = 0.5):
    """Analytic lambertian sphere on white background; returns rgba uint8."""
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1)
    R, o = c2w[:3, :3], c2w[:3, 3]
    d = dirs @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    b = np.sum(o * d, -1)
    c = np.sum(o * o) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0

    pts = o + t[..., None] * d
    n = pts / radius
    light_dir = np.array([0.5, 0.5, 0.7])
    light_dir = light_dir / np.linalg.norm(light_dir)
    lam = np.clip(np.sum(n * light_dir, -1), 0, 1)
    base = np.array([0.8, 0.3, 0.2])
    rgb = 0.2 * base + 0.8 * base * lam[..., None]
    img = np.ones((h, w, 3), np.float32)
    img[hit] = rgb[hit]
    alpha = hit.astype(np.float32)
    rgba = np.concatenate([img, alpha[..., None]], -1)
    return (rgba * 255).astype(np.uint8)


def make_test_scene(root: str, n_train: int = 6, n_test: int = 2,
                    h: int = 40, w: int = 40, cam_dist: float = 2.5):
    os.makedirs(root, exist_ok=True)
    camera_angle_x = 0.8
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

    for split, n in (("train", n_train), ("test", n_test)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for k in range(n):
            phi = 2 * np.pi * (k + (0.5 if split == "test" else 0)) / n
            pos = cam_dist * np.array([np.cos(phi), np.sin(phi), 0.45])
            c2w = look_at_pose(pos)
            rgba = render_sphere_view(c2w, h, w, focal)
            fp = f"./{split}/r_{k}"
            cv2.imwrite(os.path.join(root, f"{split}/r_{k}.png"),
                        rgba[..., [2, 1, 0, 3]])
            frames.append({"file_path": fp,
                           "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return root
