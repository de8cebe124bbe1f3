"""NeRO-style split-sum shading network with NU-NeRF transmission terms.

Reference: ``network/field.py:557-783`` (stage-1 ``AppShadingNetwork``),
``field.py:1320-1570`` (``AppShadingNetwork_SpecInner`` — same forward with
different encoding frequencies), ``field.py:1127-1283`` (diffuse-only inner
variant), and ``field.py:786-1016`` (``AppShadingNetwork_S2`` which reuses the
frozen stage-1 heads at refractive interfaces — here the ``s2_shade`` method,
applied with the frozen stage-1 parameter tree).

Physics recap (stage-1 ``__call__``):
  color = (diffuse + specular) * (1 - T)
        + (R_schlick * spec_light0 + (1 - R_schlick) * refrac_light) * T
where T is a learned transmission weight, R_schlick the Fresnel-Schlick
reflection weight, and ``refrac_light`` a learned light field standing in for
everything behind the glass.

TPU design: every head is a 256-wide MLP stack -> pure MXU matmuls on
[N, 256]-shaped batches; the FG LUT is an on-chip bilinear gather (no
nvdiffrast); the IDE encoding is two dense contractions (see ops/ide.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.fields.mlp import Predictor
from nunerf_tpu.ops.embedder import posenc, posenc_dim
from nunerf_tpu.ops.fg_lut import fg_lookup, get_fg_lut
from nunerf_tpu.ops.geometry import (
    camera_plane_intersection,
    get_sphere_intersection,
    normalize,
    offset_points_to_sphere,
    schlick_weight,
)
from nunerf_tpu.ops.ide import ipe, make_ide_fn
from nunerf_tpu.ops.srgb import linear_to_srgb

LOG_HALF = float(np.log(0.5))


class AppShadingNetwork(nn.Module):
    """Configurable shader covering the stage-1 shader, the stage-2 inner
    shaders (spec/diffuse variants), and — via ``s2_shade`` — the stage-2
    interface shader that reuses these same (frozen) heads."""

    human_light: bool = False
    sphere_direction: bool = False
    light_pos_freq: int = 6
    inner_init: float = -0.95
    roughness_init: float = 0.0
    metallic_init: float = 0.0
    light_exp_max: float = 3.0
    refrac_freq: int = 6
    refrac_exp_max: Optional[float] = None  # SpecInner uses -0.2 (field.py:1374)
    diffuse_only: bool = False              # AppShadingNetwork_DiffuseInner
    dtype: Any = None                        # compute dtype (bf16 mixed prec.)
    fused: bool = False                      # TPU fused-chain-MLP kernels

    def setup(self):
        dt, fu = self.dtype, self.fused
        self.metallic_predictor = Predictor(
            1, final_bias=self.metallic_init if self.metallic_init != 0 else None,
            name="metallic", dtype=dt, fused=fu)
        self.roughness_predictor = Predictor(
            1, final_bias=self.roughness_init if self.roughness_init != 0 else None,
            name="roughness", dtype=dt, fused=fu)
        self.albedo_predictor = Predictor(3, name="albedo", dtype=dt, fused=fu)
        self.sph_enc = make_ide_fn(5)

        outer_in = 72 * 2 if self.sphere_direction else 72
        del outer_in  # input dim is inferred by flax; kept for documentation
        self.outer_light = Predictor(3, activation="exp", exp_max=self.light_exp_max,
                                     final_bias=LOG_HALF, name="outer_light",
                                     dtype=dt, fused=fu)
        self.inner_light = Predictor(3, activation="exp", exp_max=self.light_exp_max,
                                     final_bias=LOG_HALF, name="inner_light",
                                     dtype=dt, fused=fu)
        self.inner_weight = Predictor(1, activation="none",
                                      final_bias=self.inner_init,
                                      name="inner_weight", dtype=dt, fused=fu)
        self.transmission_weight = Predictor(1, name="transmission_weight",
                                             dtype=dt, fused=fu)
        self.iors = Predictor(1, name="iors")  # vestigial but in the checkpoint
        r_exp = self.light_exp_max if self.refrac_exp_max is None else self.refrac_exp_max
        self.refrac_light = Predictor(3, activation="exp", exp_max=r_exp,
                                      final_bias=LOG_HALF, name="refrac_light",
                                      dtype=dt, fused=fu)
        if self.human_light:
            self.human_light_predictor = Predictor(
                4, activation="exp", exp_max=0.0, final_bias=float(np.log(0.01)),
                name="human_light")
        self.fg_lut = jnp.asarray(get_fg_lut(256))

    # ----- sub-predictions -------------------------------------------------

    def predict_human_light(self, points, reflective, human_poses, roughness):
        """field.py:618-634."""
        inter, dists, hits = camera_plane_intersection(points, reflective, human_poses)
        scale = 0.3
        mean = inter[..., :2] * scale
        var = roughness * (dists[:, None] * scale) ** 2
        hits = hits & (jnp.linalg.norm(mean, axis=-1) < 1.5) & (dists > 0)
        hits = hits.astype(mean.dtype)[..., None]
        mean = mean * hits
        var = jnp.broadcast_to(var * hits, mean.shape)
        enc = ipe(mean, var, 0, 6)
        hl = self.human_light_predictor(enc) * hits
        human_lights, human_weights = hl[..., :3], jnp.clip(hl[..., 3:], 0.0, 1.0)
        return human_lights, human_weights

    def _sphere_dir_enc(self, points, direction, roughness):
        sph_points = offset_points_to_sphere(points)
        sph_points = normalize(
            sph_points + direction * get_sphere_intersection(sph_points, direction))
        return self.sph_enc(sph_points, roughness)

    def predict_specular_lights(self, points, reflective, roughness, human_poses):
        """field.py:636-667; also emits the zero-roughness light for the
        transmission term."""
        # batched [2N]-row head calls: rows are independent through the
        # matmul chains, so one call per head is bit-identical to two
        n = points.shape[0]
        zero_r = jnp.zeros_like(roughness)
        enc = self.sph_enc(jnp.concatenate([reflective, reflective], 0),
                           jnp.concatenate([roughness, zero_r], 0))
        ref_rough, ref_rough_0 = enc[:n], enc[n:]
        pts = posenc(points, self.light_pos_freq)
        if self.sphere_direction:
            sph = self._sphere_dir_enc(points, reflective, roughness)
            direct = self.outer_light(jnp.concatenate(
                [enc, jnp.concatenate([sph, sph], 0)], -1))
        else:
            direct = self.outer_light(enc)
        direct_light, direct_light_0 = direct[:n], direct[n:]

        human_light, human_weight = 0.0, 0.0
        if self.human_light:
            human_light, human_weight = self.predict_human_light(
                points, reflective, human_poses, roughness)

        inner = self.inner_light(jnp.concatenate(
            [jnp.concatenate([pts, pts], 0), enc], -1))
        indirect_light, indirect_light_0 = inner[:n], inner[n:]
        ref_enc = posenc(reflective, 6)
        occ_prob = self.inner_weight(jax.lax.stop_gradient(
            jnp.concatenate([pts, ref_enc], -1)))
        occ_prob = occ_prob * 0.5 + 0.5
        occ_prob_ = jnp.clip(occ_prob, 0.0, 1.0)

        light = (indirect_light * occ_prob_
                 + (human_light * human_weight + direct_light * (1 - human_weight))
                 * (1 - occ_prob_))
        light_0 = (indirect_light_0 * occ_prob_
                   + (human_light * human_weight + direct_light_0 * (1 - human_weight))
                   * (1 - occ_prob_))
        return light, light_0, occ_prob, indirect_light * occ_prob_, human_light * human_weight

    def _lights_batched(self, points, normals, reflective, roughness, human_poses):
        """All light-head evaluations of the stage-1 forward, batched.

        ``predict_diffuse_lights`` + ``predict_specular_lights`` issue five
        256-wide predictor chains over [N]-row batches (outer_light x3,
        inner_light x2).  Matmuls are row-independent, so stacking the rows
        and calling each head once ([3N] / [2N]) is bit-identical math with
        fewer, larger MXU dispatches — the shading stack is compute-bound at
        training scale.  Returns (diffuse_light, specular pack).
        """
        zero_r = jnp.zeros_like(roughness)
        one_r = jnp.ones_like(roughness)
        n = points.shape[0]

        # sph_enc rows: [diffuse(normals, 1), spec(reflective, roughness),
        # spec0(reflective, 0)] — one IDE evaluation
        enc = self.sph_enc(
            jnp.concatenate([normals, reflective, reflective], 0),
            jnp.concatenate([one_r, roughness, zero_r], 0))
        if self.sphere_direction:
            # both specular rows share the roughness-dependent sphere enc
            # (field.py:649-652); diffuse uses roughness=1 (field.py:675)
            sph_d = self._sphere_dir_enc(points, normals, one_r)
            sph_s = self._sphere_dir_enc(points, reflective, roughness)
            outer = self.outer_light(jnp.concatenate(
                [enc, jnp.concatenate([sph_d, sph_s, sph_s], 0)], -1))
        else:
            outer = self.outer_light(enc)
        diffuse_light = outer[:n]
        direct_light = outer[n:2 * n]
        direct_light_0 = outer[2 * n:]

        human_light, human_weight = 0.0, 0.0
        if self.human_light:
            human_light, human_weight = self.predict_human_light(
                points, reflective, human_poses, roughness)

        pts = posenc(points, self.light_pos_freq)
        ref_rough = enc[n:2 * n]
        ref_rough_0 = enc[2 * n:]
        inner = self.inner_light(jnp.concatenate(
            [jnp.concatenate([pts, pts], 0),
             jnp.concatenate([ref_rough, ref_rough_0], 0)], -1))
        indirect_light, indirect_light_0 = inner[:n], inner[n:]

        ref_enc = posenc(reflective, 6)
        occ_prob = self.inner_weight(jax.lax.stop_gradient(
            jnp.concatenate([pts, ref_enc], -1)))
        occ_prob = occ_prob * 0.5 + 0.5
        occ_prob_ = jnp.clip(occ_prob, 0.0, 1.0)

        light = (indirect_light * occ_prob_
                 + (human_light * human_weight + direct_light * (1 - human_weight))
                 * (1 - occ_prob_))
        light_0 = (indirect_light_0 * occ_prob_
                   + (human_light * human_weight + direct_light_0 * (1 - human_weight))
                   * (1 - occ_prob_))
        return diffuse_light, (light, light_0, occ_prob,
                               indirect_light * occ_prob_,
                               human_light * human_weight)

    def predict_diffuse_lights(self, points, normals):
        """field.py:669-682 — outer light at max roughness (vMF prior)."""
        roughness = jnp.ones((*normals.shape[:-1], 1), normals.dtype)
        ref = self.sph_enc(normals, roughness)
        if self.sphere_direction:
            sph = self._sphere_dir_enc(points, normals, roughness)
            return self.outer_light(jnp.concatenate([ref, sph], -1))
        return self.outer_light(ref)

    def predict_materials(self, points, feature_vectors):
        fx = jnp.concatenate([feature_vectors, points], -1)
        return (self.metallic_predictor(fx), self.roughness_predictor(fx),
                self.albedo_predictor(fx))

    def outer_light_for_dir(self, points, dirs):
        """Direct outer light along ``dirs`` at zero roughness — used by the
        stage-1 background/env consistency term (renderer.py:799-821)."""
        zero_r = jnp.zeros((*dirs.shape[:-1], 1), dirs.dtype)
        dir_enc = self.sph_enc(dirs, zero_r)
        if self.sphere_direction:
            sph = self._sphere_dir_enc(points, dirs, zero_r)
            return self.outer_light(jnp.concatenate([dir_enc, sph], -1))
        return self.outer_light(dir_enc)

    # ----- stage-1 / inner-shader forward ---------------------------------

    def __call__(self, points, normals, view_dirs, feature_vectors, human_poses=None,
                 inter_results: bool = False):
        normals = normalize(normals)
        view_dirs = normalize(view_dirs)
        reflective = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 - view_dirs
        no_v = jnp.sum(normals * view_dirs, -1, keepdims=True)

        fx = jnp.concatenate([feature_vectors, points], -1)
        metallic = self.metallic_predictor(fx)
        roughness = self.roughness_predictor(fx)
        albedo = self.albedo_predictor(fx)

        if self.diffuse_only:
            # AppShadingNetwork_DiffuseInner (field.py:1245-1257): every head
            # is still evaluated — metallic and transmission multiplied by 0,
            # exactly as the reference class does — so the parameter tree is
            # IDENTICAL to the full shader and a checkpointed run can resume
            # with this flag flipped; the color is pure diffuse.
            metallic = metallic * 0.0
            transmission_weight = self.transmission_weight(fx) * 0.0
            diffuse_light, (_sl, _sl0, occ_prob, _il, _hl) = \
                self._lights_batched(points, normals, reflective, roughness,
                                     human_poses)
            # traced but unused (XLA drops it): keeps the refrac_light head
            # in the init so the parameter tree matches the full shader
            _ = self.refrac_light(jnp.concatenate(
                [posenc(points, self.refrac_freq),
                 posenc(view_dirs, self.refrac_freq)], -1))
            # DELIBERATE deviation: the reference DiffuseInner applies
            # linear_to_srgb TWICE (field.py:1268-1270 converts
            # diffuse_color and then the sum again) — almost certainly a
            # bug; we apply it once, so rendered colors differ from
            # reference output on identical weights (param tree still
            # matches exactly).
            color = linear_to_srgb(albedo * diffuse_light)
            return color, {"reflective": reflective, "occ_prob": occ_prob,
                           "transmission_weight": transmission_weight,
                           "metallic": metallic}

        transmission_weight = self.transmission_weight(fx)
        diffuse_albedo = (1 - metallic) * albedo
        diffuse_light, (specular_light, specular_light_0, occ_prob,
                        indirect_light, human_light) = self._lights_batched(
            points, normals, reflective, roughness, human_poses)
        diffuse_color = diffuse_albedo * diffuse_light
        specular_albedo = 0.04 * (1 - metallic) + metallic * albedo

        reflection_weight = schlick_weight(no_v)
        refraction_light = self.refrac_light(jnp.concatenate(
            [posenc(points, self.refrac_freq), posenc(view_dirs, self.refrac_freq)], -1))

        fg = fg_lookup(self.fg_lut, jnp.clip(no_v, 0.0, 1.0),
                       jnp.clip(roughness, 0.0, 1.0))
        specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
        specular_color = specular_ref * specular_light

        color = ((diffuse_color + specular_color) * (1 - transmission_weight)
                 + (reflection_weight * specular_light_0
                    + (1 - reflection_weight) * refraction_light) * transmission_weight)

        diffuse_color_srgb = linear_to_srgb(diffuse_color)
        specular_color_srgb = linear_to_srgb(specular_color)
        color = linear_to_srgb(color)

        occ_info = {
            "reflective": reflective,
            "occ_prob": occ_prob,
            "transmission_weight": transmission_weight,
            "metallic": metallic,
        }
        if not inter_results:
            return color, occ_info

        inter = {
            "specular_albedo": specular_albedo,
            "specular_ref": jnp.clip(specular_ref, 0.0, 1.0),
            "specular_light": jnp.clip(linear_to_srgb(specular_light_0), 0.0, 1.0),
            "specular_color": jnp.clip(
                specular_color_srgb * (1 - transmission_weight)
                + reflection_weight * specular_light_0 * transmission_weight, 0.0, 1.0),
            "diffuse_albedo": diffuse_albedo,
            "diffuse_light": jnp.clip(linear_to_srgb(diffuse_light), 0.0, 1.0),
            "diffuse_color": jnp.clip(diffuse_color_srgb, 0.0, 1.0),
            "metallic": metallic,
            "transmission_weight": transmission_weight,
            "roughness": roughness,
            "occ_prob": jnp.clip(occ_prob, 0.0, 1.0),
            "indirect_light": indirect_light,
            "refraction_light": jnp.clip(
                linear_to_srgb((1 - reflection_weight) * refraction_light
                               * transmission_weight), 0.0, 1.0),
            "reflection_weight": reflection_weight,
        }
        if self.human_light:
            inter["human_light"] = linear_to_srgb(human_light)
        return color, occ_info, inter

    # ----- stage-2 interface shader (frozen stage-1 heads) -----------------

    def s2_shade(self, points, normals, view_dirs, feature_vectors,
                 is_internal: bool, sphere_direction: bool = True):
        """AppShadingNetwork_S2.forward (field.py:909-1010): shading at a
        glass interface during stage-2 tracing, reusing this network's heads.

        color = (diffuse+spec)(1-T) + R_schlick*spec_light0*T, zeroed when
        the interface is internal; also emits
        ``refraction_coefficient = (1-R_schlick)*T`` for transmittance
        chaining.  ``is_internal`` is static per path segment.
        """
        normals = normalize(normals)
        view_dirs = normalize(view_dirs)
        reflective = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 - view_dirs
        no_v = jnp.sum(normals * view_dirs, -1, keepdims=True)

        fx = jnp.concatenate([feature_vectors, points], -1)
        metallic = self.metallic_predictor(fx)
        roughness = self.roughness_predictor(fx)
        albedo = self.albedo_predictor(fx)
        transmission_weight = self.transmission_weight(fx)

        diffuse_albedo = (1 - metallic) * albedo
        # S2 uses sphere_direction=True by default regardless of the stage-1
        # flag (field.py:789); parameter shapes only exist for the stage-1
        # configuration, so honour the stage-1 flag for the encoding path.
        roughness_one = jnp.ones_like(roughness)
        ref_d = self.sph_enc(normals, roughness_one)
        if self.sphere_direction:
            sph = self._sphere_dir_enc(points, normals, roughness_one)
            diffuse_light = self.outer_light(jnp.concatenate([ref_d, sph], -1))
        else:
            diffuse_light = self.outer_light(ref_d)
        diffuse_color = diffuse_albedo * diffuse_light
        specular_albedo = 0.04 * (1 - metallic) + metallic * albedo

        (specular_light, specular_light_0, occ_prob, _indirect,
         _human) = self.predict_specular_lights(points, reflective, roughness, None)

        reflection_weight = schlick_weight(no_v)
        fg = fg_lookup(self.fg_lut, jnp.clip(no_v, 0.0, 1.0),
                       jnp.clip(roughness, 0.0, 1.0))
        specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
        specular_color = specular_ref * specular_light

        color = ((diffuse_color + specular_color) * (1 - transmission_weight)
                 + reflection_weight * specular_light_0 * transmission_weight)
        if is_internal:
            color = color * 0
        color = linear_to_srgb(color)

        occ_info = {
            "reflective": reflective,
            "occ_prob": occ_prob,
            "transmission_weight": transmission_weight,
            "refraction_coefficient": (1 - reflection_weight) * transmission_weight,
        }
        return color, occ_info
