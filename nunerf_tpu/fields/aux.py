"""Small auxiliary field MLPs.

Reference: ``network/field.py:1020-1118`` — InfOutNetwork (direction -> RGB env
MLP), IoRNetwork and ThicknessNetwork (surface scalar fields used by the
stage-2 shell refraction), MaterialFeatsNetwork (residual feature MLP).

Note the reference IoR/Thickness stacks have *no* ReLU between their 3rd and
4th linear layers (field.py:1051-1058) — preserved here via ``relu_after``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nunerf_tpu.fields.mlp import WNMLPStack, WNDense
from nunerf_tpu.ops.embedder import posenc


class InfOutNetwork(nn.Module):
    """Direction -> RGB environment MLP (posenc deg 10, 4x256, ReLU out)."""

    @nn.compact
    def __call__(self, dirs):
        x = posenc(dirs, 10)
        return WNMLPStack(features=(256, 256, 256, 256, 3),
                          relu_after=(True, True, True, True, False),
                          final_act="relu", name="module0")(x)


class IoRNetwork(nn.Module):
    """Surface IoR scalar field: posenc(6) -> 256x3 (+1 un-ReLU'd) -> sigmoid."""

    @nn.compact
    def __call__(self, pts):
        x = posenc(pts, 6)
        return WNMLPStack(features=(256, 256, 256, 1),
                          relu_after=(True, True, False, False),
                          final_act="sigmoid", name="module0")(x)


class ThicknessNetwork(nn.Module):
    """Shell thickness scalar field (same topology as IoRNetwork)."""

    @nn.compact
    def __call__(self, pts):
        x = posenc(pts, 6)
        return WNMLPStack(features=(256, 256, 256, 1),
                          relu_after=(True, True, False, False),
                          final_act="sigmoid", name="module0")(x)


class MaterialFeatsNetwork(nn.Module):
    """Residual feature MLP (field.py:1089-1118); defined for parity."""

    @nn.compact
    def __call__(self, pts):
        x = posenc(pts, 8)
        inp = x
        h = WNMLPStack(features=(256, 256, 256, 256),
                       relu_after=(True, True, True, True), name="module0")(x)
        h = jnp.concatenate([h, inp], axis=-1)
        return WNMLPStack(features=(256, 256, 256, 256),
                          relu_after=(True, True, True, False), name="module1")(h)
