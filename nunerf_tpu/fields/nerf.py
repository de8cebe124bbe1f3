"""NeRF MLP used as the NeRF++ background model outside the unit sphere.

Reference: ``network/field.py:212-305`` (nerf-pytorch lineage).  Input is the
NeRF++ inverted-sphere parameterization ``(x/|x|, 1/|x|)`` (4-D) plus view
directions; D=8, W=256, skip at layer 4, viewdirs head.  ``density`` is the
fast path used for background alpha without the color head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nunerf_tpu.fields.mlp import Dense
from nunerf_tpu.ops.embedder import posenc


class NeRFNetwork(nn.Module):
    depth: int = 8
    width: int = 256
    multires: int = 10
    multires_view: int = 4
    skips: Sequence[int] = (4,)
    rgb_bias_init: float = 0.0  # reference sets log(0.5) (renderer.py:172)
    dtype: object = None  # compute dtype (bf16 mixed precision when set)
    fused: bool = False  # TPU fused-chain-MLP kernel for the trunk

    def setup(self):
        self.pts_layers = [Dense(self.width, name=f"pts_{i}", dtype=self.dtype)
                           for i in range(self.depth)]
        self.alpha_layer = Dense(1, name="alpha", dtype=self.dtype)
        self.feature_layer = Dense(self.width, name="feature", dtype=self.dtype)
        self.views_layer = Dense(self.width // 2, name="views_0", dtype=self.dtype)
        rb = float(self.rgb_bias_init)
        self.rgb_layer = Dense(
            3, name="rgb", dtype=self.dtype,
            bias_init=lambda rng, shape, dtype=jnp.float32: jnp.full(shape, rb, dtype))

    def _trunk(self, pts):
        enc = posenc(pts, self.multires)
        if self.fused:
            return self._trunk_fused(enc)
        h = enc
        for i in range(self.depth):
            h = self.pts_layers[i](h)
            h = jax.nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([enc, h], axis=-1)
        return h

    def _trunk_fused(self, enc):
        """Trunk through the fused chain kernel.  The post-act skip
        ``h = concat([enc, h])`` makes the NEXT layer a split-kernel layer:
        rows [0:E] of its weight multiply enc (x0 part), rows [E:] the
        carried h."""
        from nunerf_tpu.ops.fused_mlp import ChainSpec, fused_chain_mlp
        e = enc.shape[-1]
        x2 = enc.reshape(-1, e).astype(jnp.float32)

        dims, acts, has_skip, scales = [e], [], [], []
        flat_w, flat_b = [], []
        for i in range(self.depth):
            w, b = self.pts_layers[i](
                jnp.zeros((1, e if i == 0 else
                           (e + self.width if (i - 1) in self.skips
                            else self.width))), return_weights=True)
            if i > 0 and (i - 1) in self.skips:
                w_x, w_h = w[:e], w[e:]
                flat_w.append(w_h)
                flat_w.append(w_x)
                has_skip.append(True)
            else:
                flat_w.append(w)
                has_skip.append(False)
            flat_b.append(b[None, :])
            dims.append(self.width)
            acts.append("relu")
            scales.append(1.0)

        spec = ChainSpec(
            tuple(dims), tuple(acts), tuple(has_skip), tuple(scales),
            compute_dtype="bfloat16" if self.dtype == jnp.bfloat16 else "float32")
        h = fused_chain_mlp(spec, x2, *flat_w, *flat_b)
        h = h.reshape(*enc.shape[:-1], self.width)
        if (self.depth - 1) in self.skips:
            h = jnp.concatenate([enc, h], axis=-1)
        return h

    def __call__(self, pts, views):
        h = self._trunk(pts)
        alpha = self.alpha_layer(h)
        feature = self.feature_layer(h)
        venc = posenc(views, self.multires_view)
        if self.dtype is not None:
            venc = venc.astype(self.dtype)
        hv = jnp.concatenate([feature, venc], axis=-1)
        hv = jax.nn.relu(self.views_layer(hv))
        rgb = self.rgb_layer(hv)
        return alpha.astype(jnp.float32), rgb.astype(jnp.float32)

    def density(self, pts):
        return self.alpha_layer(self._trunk(pts)).astype(jnp.float32)
