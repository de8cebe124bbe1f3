"""Stage-2 renderer, non-zero-thickness mode: curvature-aware shell refraction.

Re-design of the reference thick-glass ``Stage2Renderer``
(``network/renderer.py:907-2404``).  Each interface crossing traverses a thin
shell: the local surface is approximated by a sphere of radius
``1/sqrt(|K|)`` from the interpolated Gaussian curvature, the shell exit point
is found analytically on the offset sphere (entry Snell -> shell chord ->
exit Snell), with learned per-point IoR (``1/(x+0.6)`` map, renderer.py:1727)
and learned thickness (``x*0.01``, :1741); the inner medium is assumed air
(:1732-1734).  Curvature-sign branches (:1799-2009) become ``where`` selects.

Differences from the zero-thickness mode (models/stage2.py):
* two Snell refractions per interface with shell displacement;
* exiting rays first pull the mesh hit back to the inner shell surface
  (:1880-1931) and record that as the interface point;
* outside segments use 64 samples and inverse-depth background sampling
  (:2101-2121) instead of NeRF-importance background;
* the inner shader is the SpecInner variant (field.py:1320-1570);
* interfaces after the first are internal (``i != 0``, :2272) and the rgb
  loss is additionally masked by the object mask (:1328).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from nunerf_tpu.config import STAGE2_DEFAULTS, merge_cfg
from nunerf_tpu.fields.shading import AppShadingNetwork
from nunerf_tpu.models.stage2 import Stage2Renderer, ZERO_THICK_DEFAULTS
from nunerf_tpu.ops.geometry import normalize, safe_norm, safe_sqrt

SHELL_DEFAULTS = dict(
    ZERO_THICK_DEFAULTS,
    n_samples_outer=64,     # renderer.py:2068
    n_samples_inner=64,     # :2070 (+2x32 upsampled)
    inner_up_rounds=2,
    inner_up_each=32,
    n_bg_inverse=64,        # inverse-depth background samples (:2102)
    seg_far=4.5,
    thickness_scale=0.01,   # :1741-1742
    ior_offset=0.6,         # eta = 1/(x+0.6)  (:1727-1728)
)


class Stage2ShellRenderer(Stage2Renderer):
    def __init__(self, cfg: Dict[str, Any], scene=None, stage1_params=None):
        cfg = merge_cfg(SHELL_DEFAULTS, cfg)
        super().__init__(cfg, scene=scene, stage1_params=stage1_params)
        shader_cfg = self.cfg.get("shader_config") or {}
        dtype = jnp.bfloat16 if self.cfg.get("mixed_precision", True) else None
        # SpecInner shader config (field.py:1321-1330); cfg inner_diffuse_only
        # selects the DiffuseInner capacity instead (see models/stage2.py —
        # same veil pathology: transmission + refrac_light on the inflated
        # inner surface fake the through-glass background and kill carving)
        self.color_inner = AppShadingNetwork(
            sphere_direction=bool(shader_cfg.get("sphere_direction", False)),
            human_light=False, light_pos_freq=8, refrac_freq=2,
            light_exp_max=5.0, refrac_exp_max=-0.2, dtype=dtype,
            diffuse_only=bool(self.cfg.get("inner_diffuse_only", False)))

    # interfaces after the first are internal (renderer.py:2272)
    @staticmethod
    def _is_internal(i: int) -> bool:
        return i != 0

    # ------------------------------------------------------------------
    def _shell_cross(self, P, n, d_in, cos_t, r, thickness, curv_pos):
        """Chord through the shell on the osculating sphere.

        P: interface point; n: interface normal (toward the incoming side);
        d_in: refracted direction inside the shell; cos_t: cos of the
        refracted angle; r: curvature radius; curv_pos: bool mask of
        positive-curvature lanes.  Returns (exit point Q, exit normal,
        glass chord length L).
        Implements renderer.py:1819-1848 (entry) / :1944-1983 (exit legs).
        """
        ctr = r * cos_t
        # positive curvature: inner sphere radius r - thickness
        delta_pos = safe_sqrt(ctr * ctr - 2 * r * thickness
                              + thickness * thickness, 1e-4)
        # negative curvature: inner sphere radius r + thickness
        delta_neg = safe_sqrt(ctr * ctr + 2 * r * thickness
                              + thickness * thickness, 1e-4)
        L = jnp.where(curv_pos, jnp.abs(ctr - delta_pos),
                      jnp.abs(ctr - delta_neg))
        center = jnp.where(curv_pos, P - n * r, P + n * r)
        Q = P + d_in * (L + 0.001)
        n_after = jnp.where(curv_pos, Q - center, center - Q)
        return Q, normalize(n_after), L

    def ray_trace(self, params, rays_o, rays_d, step=None):
        """3 bounces with shell refraction (renderer.py:1610-2009).
        ``freeze_ior_step``: see models/stage2.py ray_trace."""
        cfg = self.cfg
        train = params["train"]
        frozen_ior = self._freeze_flag(train, step,
                                       "freeze_ior_step", "freeze_ior_inv_s")
        # round-3 shell finding (runs/chain_shell2.log): the thickness field
        # collapsed from its 0.005 init to 0.0007 (GT 0.008) while the inner
        # NeuS stayed fog (inv_s fell to 12.6) — zero thickness makes the
        # shell a no-op slab whose bending the inner light field then paints.
        # Same cure as IoR: hold the init until geometry is ready.
        frozen_th = self._freeze_flag(train, step, "freeze_thickness_step",
                                      "freeze_thickness_inv_s")
        bounces = []
        start, direc = rays_o, normalize(rays_d)
        active = jnp.ones(rays_o.shape[0], bool)
        tir_bad = jnp.zeros(rays_o.shape[0], bool)

        for i in range(cfg["max_bounces"]):
            outside = (i % 2 == 0)
            res = self.scene.dintersect(start, direc)
            hit = res["hit"] & active
            normal = res["normal"] if outside else -res["normal"]
            # orient against the incoming ray regardless of mesh winding
            # (see models/stage2.py ray_trace)
            opposes = jnp.sum(normal * -direc, axis=-1, keepdims=True) >= 0
            normal = jnp.where(opposes, normal, -normal)
            # curvature is signed by the same winding as the normal: flip it
            # together with the normal so an inward-wound mesh still puts the
            # shell offset Q on the correct side
            K = jnp.where(opposes, res["curvature"], -res["curvature"])  # [R,1]
            r = 1.0 / safe_sqrt(jnp.abs(K), 1e-6)
            r = jnp.nan_to_num(r, nan=0.1)

            ior = self._maybe_freeze(
                self.ior_net.apply(train["ior"], res["pos"]), frozen_ior)
            eta1 = 1.0 / (ior + cfg["ior_offset"])
            # inner medium assumed air (renderer.py:1732-1734)
            eta_inner = jnp.full_like(eta1, 1.0 / 1.0001)
            eta2 = eta_inner / eta1
            thickness = self._maybe_freeze(
                self.thickness_net.apply(train["thickness"], res["pos"]),
                frozen_th) * cfg["thickness_scale"]
            if not outside:
                eta1, eta2 = 1.0 / eta2, 1.0 / eta1

            P = res["pos"]
            iface_pt = P
            iface_normal = normal

            if outside:
                curv_pos = K >= 0
                cos_i = jnp.sum(normal * -direc, axis=-1, keepdims=True)
                sin2_i = 1.0 - cos_i * cos_i
                tir1 = (eta1 * eta1 * sin2_i)[..., 0] > 0.999
                sin2_t = jnp.clip(eta1 * eta1 * sin2_i, 0.0, 0.999)
                cos_t = safe_sqrt(1.0 - sin2_t, 1e-4)
                d_in = normalize(eta1 * direc
                                 + (eta1 * cos_i - cos_t) * normal)
                Q, n_after, chord = self._shell_cross(P, normal, d_in, cos_t,
                                                      r, thickness, curv_pos)
                cos2 = jnp.sum(n_after * -d_in, axis=-1, keepdims=True)
                sin2_2 = 1.0 - cos2 * cos2
                tir2 = (sin2_2 * eta2 * eta2)[..., 0] > 0.999
                sin2_t2 = jnp.clip(sin2_2 * eta2 * eta2, 0.0, 0.999)
                next_dir = normalize(eta2 * d_in
                                     + (eta2 * cos2 - safe_sqrt(1 - sin2_t2, 1e-4))
                                     * n_after)
                next_start = Q
                tir_here = tir1 | tir2
            else:
                # exiting: pull the outer-mesh hit back to the inner shell
                # (renderer.py:1880-1931)
                curv_pos = K <= 0
                cos_i = jnp.sum(normal * -direc, axis=-1, keepdims=True)
                ctr_i = r * cos_i
                delta_pos = safe_sqrt(ctr_i * ctr_i - 2 * r * thickness
                                      + thickness * thickness, 1e-4)
                delta_neg = safe_sqrt(ctr_i * ctr_i + 2 * r * thickness
                                      + thickness * thickness, 1e-4)
                L_back = jnp.where(curv_pos, jnp.abs(ctr_i - delta_pos),
                                   jnp.abs(ctr_i - delta_neg))
                center0 = jnp.where(curv_pos, P - normal * r, P + normal * r)
                P_inner = P - L_back * direc
                n_mod = jnp.where(curv_pos, P_inner - center0,
                                  center0 - P_inner)
                n_mod = normalize(n_mod)
                iface_pt = P_inner
                iface_normal = normal  # gradient_mesh keeps the mesh normal

                cos_mod = jnp.sum(n_mod * -direc, axis=-1, keepdims=True)
                sin2_mod = 1.0 - cos_mod * cos_mod
                tir1 = (sin2_mod * eta1 * eta1)[..., 0] > 0.999
                sin2_t1 = jnp.clip(sin2_mod * eta1 * eta1, 0.0, 0.999)
                d_in = normalize(eta1 * direc
                                 + (eta1 * cos_mod - safe_sqrt(1 - sin2_t1, 1e-4))
                                 * n_mod)
                cos_t = safe_sqrt(1.0 - sin2_t1, 1e-4)
                Q, n_after, chord = self._shell_cross(P_inner, n_mod, d_in,
                                                      cos_t, r, thickness,
                                                      curv_pos)
                cos2 = jnp.sum(n_after * -d_in, axis=-1, keepdims=True)
                sin2_2 = 1.0 - cos2 * cos2
                tir2 = (sin2_2 * eta2 * eta2)[..., 0] > 0.999
                sin2_t2 = jnp.clip(sin2_2 * eta2 * eta2, 0.0, 0.999)
                next_dir = normalize(eta2 * d_in
                                     + (eta2 * cos2 - safe_sqrt(1 - sin2_t2, 1e-4))
                                     * n_after)
                next_start = Q
                tir_here = tir1 | tir2

            conv = hit & ~tir_here
            tir_bad = tir_bad | (hit & tir_here)

            bounces.append({
                "start": start, "dir": direc, "active": active,
                "hit": hit, "conv": conv, "pos": iface_pt,
                "normal": iface_normal, "eta": eta1,
                "next_dir": next_dir, "ior_raw": ior,
                "ior_frozen": jnp.asarray(
                    frozen_ior if frozen_ior is not None else 0, jnp.float32),
                "thickness": thickness,
                "thickness_frozen": jnp.asarray(
                    frozen_th if frozen_th is not None else 0, jnp.float32),
                # glass path length crossed at this interface, for the
                # Beer-Lambert term in the transmittance chain (stage2.render)
                "chord": chord + 0.001,
            })
            start, direc, active = next_start, next_dir, conv

        # reference fixup (renderer.py:1660-1670): bounce-0 convergence is
        # revoked when the refracted ray fails to exit the mesh
        if len(bounces) >= 2:
            keep = bounces[1]["hit"] | ~bounces[0]["conv"]
            bounces[0]["conv"] = bounces[0]["conv"] & bounces[1]["hit"]
            bounces[1]["active"] = bounces[0]["conv"]
            del keep

        return bounces, ~tir_bad

    # ------------------------------------------------------------------
    def _sample_outer_segment(self, params, b, rng, seg_index: int = 0):
        """64 uniform to the hit; on miss, stage-1's exact background law
        (default — see Stage2Renderer._stage1_bg_z) or the reference's
        inverse-depth law (cfg bg_sampling: 'inverse',
        renderer.py:2067-2121)."""
        cfg = self.cfg
        n = cfg["n_samples_outer"]
        start, direc = b["start"], b["dir"]

        end_hit = b["pos"]
        z_frac = jnp.linspace(0.0, 1.0, n)[None, :, None]
        pts_hit = start[:, None, :] + (end_hit - start)[:, None, :] * z_frac

        if cfg.get("bg_sampling", "stage1_exact") == "stage1_exact":
            near = cfg["bg_near0"] if seg_index == 0 else 1e-3
            z_out = self._stage1_bg_z(n, near)
        else:
            z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (n + 1.0), n)
            z_out = 1.0 / jnp.flip(z_out) + 1.0 / n  # inverse depth (:2114)
        pts_miss = start[:, None, :] + direc[:, None, :] * z_out[None, :, None]

        return jnp.where(b["hit"][:, None, None], pts_hit, pts_miss)

    def train_outputs(self, params, batch, rng, step):
        outputs = self.render(params, batch["rays_o"], normalize(batch["rays_d"]),
                              rng, step,
                              cos_anneal_ratio=self.get_anneal_val(step),
                              is_train=True)
        tm = outputs["tir_mask"]
        if "masks" in batch:
            tm = tm * batch["masks"][:, None]
        outputs["loss_rgb"] = self.compute_rgb_loss(
            outputs["ray_rgb"] * tm, batch["rgbs"] * tm)
        return outputs

    def test_outputs(self, params, batch, rng, step):
        outputs = super().test_outputs(params, batch, rng, step)
        if "masks" in batch:
            tm = outputs["tir_mask"] * batch["masks"][:, None]
            outputs["loss_rgb"] = self.compute_rgb_loss(
                outputs["ray_rgb"] * tm, batch["rgbs"] * tm)
        return outputs
