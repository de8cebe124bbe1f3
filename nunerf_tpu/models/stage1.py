"""Stage-1 renderer: outer transparent surface as a NeuS SDF + NeRF++ background.

Re-design of the reference ``NeROShapeRenderer`` (``network/renderer.py:102-903``
and the zero-thickness twin ``network/renderer_zerothick.py:89-866``) as a pure
function over a parameter pytree.

TPU-first differences from the reference:
* ``render`` is one jittable pure function — no Python-side boolean masking;
  inner (SDF) and outer (NeRF++) branches are evaluated masked and merged with
  ``where`` (renderer.py:756-779 uses boolean compaction);
* step-gated losses (init SDF regularizer < 1000 steps, occlusion loss
  >= occ_loss_step) run under ``lax.cond`` so the inactive branch costs
  nothing at runtime while shapes stay static;
* the occlusion-loss subset (renderer.py:721-727 randperm) becomes a
  fixed-K weighted-random top-k selection;
* SDF normals come from per-sample ``jax.grad`` (forward-over-reverse replaces
  double backward);
* the hierarchical NeuS upsampling (renderer.py:585-625) runs under
  ``stop_gradient`` exactly like the reference's ``no_grad``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.config import SHADER_DEFAULTS, STAGE1_DEFAULTS, merge_cfg
from nunerf_tpu.fields.aux import InfOutNetwork
from nunerf_tpu.fields.nerf import NeRFNetwork
from nunerf_tpu.fields.sdf import SDFNetwork
from nunerf_tpu.fields.shading import AppShadingNetwork
from nunerf_tpu.fields.variance import SingleVarianceNetwork
from nunerf_tpu.ops.geometry import (
    get_sphere_intersection,
    normalize,
    offset_points_to_sphere,
)
from nunerf_tpu.ops.sampling import (
    get_intersection,
    merge_z_vals,
    neus_upsample,
    sample_pdf,
)
from nunerf_tpu.ops.srgb import linear_to_srgb
from nunerf_tpu.ops.volume import alpha_to_weights


def masked_mean(x, mask, eps: float = 1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)


class ShapeRenderer:
    """Holds module definitions + cfg; all state lives in the params pytree."""

    def __init__(self, cfg: Dict[str, Any]):
        defaults = dict(STAGE1_DEFAULTS)
        if (cfg or {}).get("zero_thickness", False):
            # zero-thickness stage-1 defaults differ
            # (renderer_zerothick.py:119,110: 512 rays, half-res validation)
            defaults["train_ray_num"] = 512
            defaults["downsample_ratio"] = 0.5
        self.cfg = merge_cfg(defaults, cfg)
        shader_cfg = merge_cfg(SHADER_DEFAULTS, self.cfg.get("shader_config") or {})
        self.shader_cfg = shader_cfg
        sdf_dtype = (jnp.bfloat16
                     if self.cfg.get("sdf_mixed_precision") else None)
        self.sdf_net = SDFNetwork(
            d_out=self.cfg["sdf_d_out"], n_layers=self.cfg["sdf_n_layers"],
            skip_in=(self.cfg["sdf_n_layers"] // 2,), multires=self.cfg["sdf_freq"],
            bias=self.cfg["sdf_bias"], geometric_init=self.cfg["geometry_init"],
            dtype=sdf_dtype)
        self.var_net = SingleVarianceNetwork(
            init_val=self.cfg["inv_s_init"], activation=self.cfg["std_act"])
        dtype = jnp.bfloat16 if self.cfg.get("mixed_precision", True) else None
        fused = self.cfg.get("fused_mlp")
        if fused is None:
            from nunerf_tpu.ops.fused_mlp import use_fused_mlp
            fused = use_fused_mlp()
        self.fused = bool(fused)
        fused_sdf = self.cfg.get("fused_sdf")
        if fused_sdf is None:
            from nunerf_tpu.ops.fused_mlp import use_fused_sdf
            fused_sdf = use_fused_sdf()
        self.fused_sdf = bool(fused_sdf)
        # matmul_precision high/highest asks for reference-grade numerics:
        # the fused value kernel computes in bf16 on TPU, so it must not
        # silently bypass that knob (cfg fused_sdf_value / env
        # NUNERF_FUSED_SDF_VALUE still force it either way)
        fsv = self.cfg.get("fused_sdf_value")
        if fsv is None:
            import os
            from nunerf_tpu.ops.fused_mlp import use_fused_sdf_value
            if (self.cfg.get("matmul_precision", "default") in ("high", "highest")
                    and os.environ.get("NUNERF_FUSED_SDF_VALUE") is None):
                fsv = False
            else:
                fsv = use_fused_sdf_value()
        self.fused_sdf_value = bool(fsv)
        self.outer_nerf = NeRFNetwork(rgb_bias_init=float(np.log(0.5)),
                                      dtype=dtype, fused=self.fused)
        self.color_net = AppShadingNetwork(
            human_light=shader_cfg["human_light"],
            sphere_direction=shader_cfg["sphere_direction"],
            light_pos_freq=shader_cfg["light_pos_freq"],
            inner_init=shader_cfg["inner_init"],
            roughness_init=shader_cfg["roughness_init"],
            metallic_init=shader_cfg["metallic_init"],
            light_exp_max=shader_cfg["light_exp_max"],
            refrac_freq=shader_cfg["refrac_freq"],
            dtype=dtype, fused=self.fused)
        self.inf_out = InfOutNetwork()

    # ------------------------------------------------------------------
    def init_params(self, rng) -> Dict[str, Any]:
        r = jax.random.split(rng, 5)
        d3 = jnp.zeros((1, 3))
        d4 = jnp.zeros((1, 4))
        feats = jnp.zeros((1, 256))
        return {
            "sdf": self.sdf_net.init(r[0], d3),
            "var": self.var_net.init(r[1], d3),
            "nerf": self.outer_nerf.init(r[2], d4, d3),
            "shade": self.color_net.init(r[3], d3, d3, d3, feats),
            "inf_out": self.inf_out.init(r[4], d3),
        }

    # ----- field evaluation helpers -----------------------------------
    def sdf(self, params, x):
        """SDF value only — the hot path of the sampling sweeps and the
        occlusion march (all under stop_gradient / first-order), so it may
        use the fused kernel; ``sdf_all`` (second-order) may not."""
        if self.fused or self.fused_sdf_value:
            from nunerf_tpu.fields.sdf import fused_sdf_apply
            return fused_sdf_apply(self.sdf_net, params["sdf"], x,
                                   value_only=True)
        return self.sdf_net.apply(params["sdf"], x)[..., :1]

    def sdf_all(self, params, x):
        """(sdf [N], feats [N,256], grad [N,3]).

        The reference computes normals with double backward
        (field.py:158-170); here vmap(jax.grad) reverse-over-reverse — the
        fastest of three measured formulations (see
        ``sdf_value_feature_grad``).  ``fused_sdf`` opts into the Pallas
        value+jacobian kernel instead.
        """
        if self.fused_sdf:
            if self.cfg.get("sdf_remat") and not getattr(
                    self, "_warned_remat_fused", False):
                # make the no-op combination visible in A/B perf runs
                print("WARNING: sdf_remat has no effect with fused_sdf "
                      "(the fused kernel takes the branch first)")
                self._warned_remat_fused = True
            from nunerf_tpu.fields.sdf import fused_sdf_all
            return fused_sdf_all(self.sdf_net, params["sdf"], x)
        from nunerf_tpu.fields.sdf import sdf_value_feature_grad
        apply = self.sdf_net.apply
        if self.cfg.get("sdf_remat"):
            # reverse-over-reverse materializes O(layers) [N,256] residual
            # tensors twice; remat recomputes the (MXU-cheap) trunk in each
            # backward instead of storing it — an HBM-traffic/FLOPs trade
            apply = jax.checkpoint(
                apply, policy=jax.checkpoint_policies.nothing_saveable)
        return sdf_value_feature_grad(apply, params["sdf"], x)

    def inv_s(self, params, x):
        return self.var_net.apply(params["var"], x)

    # ----- sampling ----------------------------------------------------
    def sample_ray(self, params, rays_o, rays_d, near, far, perturb: float, rng):
        """Hierarchical NeuS sampling (renderer.py:585-625).

        Returns z_vals [R, n_samples+n_importance+n_bg_samples]; the inner
        part is sorted ascending, background samples appended after.
        """
        cfg = self.cfg
        n_bg = cfg["n_bg_samples"]
        rn = rays_o.shape[0]

        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (n_bg + 1.0), n_bg)
        if perturb > 0:
            rng, r2 = jax.random.split(rng)
            mids = 0.5 * (z_out[1:] + z_out[:-1])
            upper = jnp.concatenate([mids, z_out[-1:]])
            lower = jnp.concatenate([z_out[:1], mids])
            t2 = jax.random.uniform(r2, (rn, n_bg))
            z_out = lower[None, :] + (upper - lower)[None, :] * t2
        else:
            z_out = jnp.broadcast_to(z_out[None, :], (rn, n_bg))

        z_out = far / jnp.flip(z_out, axis=-1) + 1.0 / n_bg  # [R, n_bg]

        z_vals = self._hierarchical_inner(params, rays_o, rays_d, near, far,
                                          perturb, rng, abs_jitter=True)
        return jnp.concatenate([z_vals, z_out], axis=-1)

    def sample_ray_partitioned(self, params, rays_o, rays_d, near, far,
                               perturb: float, rng):
        """Sphere-clipped sampling: a STATIC partition of the sample axis.

        The reference boolean-compacts samples into SDF / background branches
        at runtime (renderer.py:756-779); the round-1 TPU port instead paid
        for BOTH branches at every sample.  This variant clips the
        hierarchical NeuS samples to the ray's unit-sphere chord [t0, t1]
        (inside by construction -> SDF branch), places uniform outer samples
        in the [near, t0] and [t1, far] gaps plus the inverse-depth tail
        (outside by construction -> NeRF++ branch), so each branch's
        networks run only on their own static slice.  Rays that miss the
        sphere collapse the chord to the closest-approach point and spread
        the gap samples across [near, far].

        Returns (z_vals [R, F+I+B], sphere_hit [R]) with the static
        partition (F, I) = (n_front, n_samples + n_importance).
        """
        cfg = self.cfg
        n_front = cfg["n_front_samples"]
        n_back = cfg["n_back_samples"]
        n_bg = cfg["n_bg_samples"]
        rn = rays_o.shape[0]

        # robust ray/unit-sphere chord (rays_d need not be unit length)
        a = jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
        c = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True) - 1.0
        disc = b * b - 4.0 * a * c
        hit = disc[..., 0] > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        mid = -b / (2.0 * a)
        t0 = jnp.where(hit[:, None], (-b - sq) / (2.0 * a), mid)
        t1 = jnp.where(hit[:, None], (-b + sq) / (2.0 * a), mid)
        t0 = jnp.clip(t0, near, far)
        t1 = jnp.clip(t1, near, far)
        sphere_hit = hit & (t1[..., 0] > t0[..., 0])

        r_in, r_gap, r_bg = jax.random.split(rng, 3)

        def gap_fractions(n, key):
            base = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
            if perturb > 0:
                jit = (jax.random.uniform(key, (rn, n)) - 0.5) / n
                return base[None, :] + jit
            return jnp.broadcast_to(base[None, :], (rn, n))

        kf, kb = jax.random.split(r_gap)
        z_front = near + (t0 - near) * gap_fractions(n_front, kf)
        z_back = t1 + (far - t1) * gap_fractions(n_back, kb)

        # inverse-depth background tail beyond ``far`` (same law as the
        # legacy path / the reference's stage-1 background sampling)
        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (n_bg + 1.0), n_bg)
        if perturb > 0:
            mids = 0.5 * (z_out[1:] + z_out[:-1])
            upper = jnp.concatenate([mids, z_out[-1:]])
            lower = jnp.concatenate([z_out[:1], mids])
            t2 = jax.random.uniform(r_bg, (rn, n_bg))
            z_out = lower[None, :] + (upper - lower)[None, :] * t2
        else:
            z_out = jnp.broadcast_to(z_out[None, :], (rn, n_bg))
        z_out = far / jnp.flip(z_out, axis=-1) + 1.0 / n_bg

        z_in = self._hierarchical_inner(params, rays_o, rays_d, t0, t1,
                                        perturb, r_in)
        z_in = jnp.clip(z_in, t0, t1)  # jitter must not leak into the gaps

        z_vals = jnp.concatenate([z_front, z_in, z_back, z_out], axis=-1)
        return z_vals, sphere_hit

    def _hierarchical_inner(self, params, rays_o, rays_d, near, far,
                            perturb: float, rng, abs_jitter: bool = False):
        """The hierarchical NeuS rounds of ``sample_ray`` over an arbitrary
        [near, far] interval (no background tail).  Returns [R, n_s + n_imp]
        sorted ascending.  ``abs_jitter`` keeps the reference's absolute
        jitter amplitude (renderer.py:594, assumes far-near ~ 2); the
        partitioned path scales the jitter to the chord length."""
        cfg = self.cfg
        n_samples = cfg["n_samples"]
        n_imp = cfg["n_importance"]
        steps = cfg["up_sample_steps"]
        rn = rays_o.shape[0]

        z_vals = jnp.linspace(0.0, 1.0, n_samples)[None, :]
        z_vals = near + (far - near) * z_vals  # [R, n]
        if perturb > 0:
            t_rand = jax.random.uniform(rng, (rn, 1)) - 0.5
            amp = 2.0 if abs_jitter else 2.0 * (far - near)
            z_vals = z_vals + t_rand * amp / n_samples

        def stop(x):
            return jax.lax.stop_gradient(x)

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        sdf = stop(self.sdf(params, pts.reshape(-1, 3)).reshape(rn, n_samples))
        for i in range(steps):
            sn = z_vals.shape[1]
            if cfg["clip_sample_variance"]:
                inv_s = stop(self.inv_s(params, jnp.zeros((1, 3)))[0, 0])
                inv_s = jnp.minimum(inv_s, 64 * 2**i) * jnp.ones((rn, sn - 1))
            else:
                inv_s = jnp.ones((rn, sn - 1)) * 64 * 2**i
            new_z = neus_upsample(rays_o, rays_d, z_vals, sdf, n_imp // steps, inv_s)
            last = i + 1 == steps
            if not last:
                new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
                new_sdf = stop(self.sdf(params, new_pts.reshape(-1, 3))
                               .reshape(rn, new_z.shape[1]))
                z_vals, sdf = merge_z_vals(z_vals, new_z, sdf, new_sdf)
            else:
                z_vals, _ = merge_z_vals(z_vals, new_z, sdf, None)
        return z_vals

    # ----- shading branches --------------------------------------------
    def compute_density_alpha(self, params, points, dists, dirs):
        """NeRF++ background alpha/color (renderer.py:700-706)."""
        norm = jnp.maximum(jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-3)
        pts4 = jnp.concatenate([points / norm, 1.0 / norm], axis=-1)
        density, color = self.outer_nerf.apply(params["nerf"], pts4, dirs)
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
        color = linear_to_srgb(jnp.exp(jnp.minimum(color, 5.0)))
        return alpha, color

    def compute_sdf_alpha(self, params, points, dists, dirs, cos_anneal_ratio, step):
        """NeuS alpha from SDF (renderer.py:670-698)."""
        sdf, feats, grads = self.sdf_all(params, points)
        inv_s = jnp.clip(self.inv_s(params, points), 1e-6, 1e6)[..., 0]
        freeze = self.cfg.get("freeze_inv_s_step")
        if freeze is not None:
            inv_s = jax.lax.cond(step < freeze,
                                 lambda v: jax.lax.stop_gradient(v),
                                 lambda v: v, inv_s)
        true_cos = jnp.sum(dirs * grads, axis=-1)
        iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                     + jax.nn.relu(-true_cos) * cos_anneal_ratio)
        est_next = sdf + iter_cos * dists * 0.5
        est_prev = sdf - iter_cos * dists * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
        return alpha, grads, feats, inv_s, sdf

    # ----- losses ------------------------------------------------------
    def _occ_loss(self, params, points, sdf, grads, dirs, occ_prob, reflective,
                  valid_mask, rng):
        """Occlusion loss (renderer.py:708-736) with fixed-K selection.

        points [N,3] flattened inner samples; occ_prob [N,1]; valid lanes
        chosen by (inner & surface & front-facing) then weighted random top-K.
        """
        # small-batch configs can have fewer candidate points than the cap
        k = min(int(self.cfg["occ_loss_max_pn"]), points.shape[0])
        inner = jnp.linalg.norm(points, axis=-1) < 0.999
        sdf_ok = jnp.abs(sdf) < self.cfg["occ_sdf_thresh"]
        facing = jnp.sum(grads * dirs, axis=-1) < 0
        mask = inner & sdf_ok & facing & valid_mask

        # weighted-random fixed-K subset: random priority, invalid -> -inf
        pri = jax.random.uniform(rng, mask.shape)
        pri = jnp.where(mask, pri, -1.0)
        _, idx = jax.lax.top_k(pri, k)
        sel_valid = jnp.take(mask, idx)

        sel_pts = jnp.take(points, idx, axis=0)
        sel_ref = jnp.take(occ_prob, idx, axis=0)  # [K,1] predicted occ prob
        sel_dirs = jnp.take(reflective, idx, axis=0)

        sdf_fn = lambda x: self.sdf(params, x)
        inv_fn = lambda x: self.inv_s(params, x)
        _, inter_prob, _ = get_intersection(sdf_fn, inv_fn, sel_pts, sel_dirs,
                                            sn0=64, sn1=16)
        occ_gt = jnp.sum(inter_prob, axis=-1, keepdims=True)
        return masked_mean(jnp.abs(sel_ref - occ_gt)[..., 0], sel_valid)

    @staticmethod
    def _init_sdf_reg(points, sdf, step):
        """InitSDFRegLoss (network/loss.py:115-149), masked fixed-shape."""
        norm = jnp.linalg.norm(points, axis=-1)
        small_mask = norm < 0.1
        bounds_s = norm - 0.1
        small_v = jnp.maximum(sdf - bounds_s, 0.0) * small_mask
        small_mean = masked_mean(small_v, small_mask)
        small_loss = small_mean / ((small_mean > 1e-5).astype(jnp.float32) + 1e-3)

        large_mask = norm > 1.05
        bounds_l = norm - 1.05
        large_v = jnp.maximum(bounds_l - sdf, 0.0) * large_mask
        cnt = jnp.sum((large_v > 1e-5).astype(jnp.float32))
        large_loss = jnp.sum(large_v) / (cnt + 1e-3)

        anneal = (jnp.cos((step / 1000.0) * jnp.pi) + 1.0) / 2.0
        return small_loss * anneal, large_loss * anneal

    def compute_rgb_loss(self, rgb_pr, rgb_gt):
        """renderer.py:514-526."""
        mode = self.cfg["rgb_loss"]
        if mode == "l2":
            return jnp.sum((rgb_pr - rgb_gt) ** 2, -1)
        if mode == "l1":
            return jnp.sum(jnp.abs(rgb_pr - rgb_gt), -1)
        if mode == "charbonier":
            return jnp.sqrt(jnp.sum((rgb_gt - rgb_pr) ** 2, axis=-1) + 0.001)
        raise NotImplementedError(mode)

    # ----- the core ----------------------------------------------------
    def render_core(self, params, rays_o, rays_d, z_vals, human_poses,
                    cos_anneal_ratio, step, rng, is_train: bool, is_nerf: bool,
                    with_inter: bool = False):
        """renderer.py:738-859, masked fixed-shape."""
        rn, sn = z_vals.shape
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        dists = jnp.concatenate([dists, dists[:, -1:]], axis=-1)
        mid_z = z_vals + dists * 0.5
        points = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
        inner_mask = jnp.linalg.norm(points, axis=-1) <= 1.0  # [R,S]

        dirs = jnp.broadcast_to(normalize(rays_d)[:, None, :], points.shape)
        flat_pts = points.reshape(-1, 3)
        flat_dirs = dirs.reshape(-1, 3)
        flat_dists = dists.reshape(-1)
        flat_inner = inner_mask.reshape(-1)

        # outer branch (NeRF++): evaluated everywhere, used where outer
        alpha_nerf, color_nerf = self.compute_density_alpha(
            params, flat_pts, flat_dists, -flat_dirs)

        # inner branch (SDF + shading): clamp points for safe eval outside
        alpha_sdf, grads, feats, inv_s, sdf = self.compute_sdf_alpha(
            params, flat_pts, flat_dists, flat_dirs, cos_anneal_ratio, step)
        if human_poses is not None:
            hp = jnp.broadcast_to(human_poses[:, None], (rn, sn, 3, 4)).reshape(-1, 3, 4)
        else:
            hp = None
        color_sdf, occ_info = self.color_net.apply(
            params["shade"], flat_pts, grads, -flat_dirs, feats, hp)

        alpha = jnp.where(flat_inner, alpha_sdf, alpha_nerf).reshape(rn, sn)
        sampled_color = jnp.where(flat_inner[:, None], color_sdf,
                                  color_nerf).reshape(rn, sn, 3)
        alpha_bkgr = jnp.where(flat_inner, 0.0, alpha_nerf).reshape(rn, sn)
        color_bkgr_s = jnp.where(flat_inner[:, None], 0.0,
                                 color_nerf).reshape(rn, sn, 3)

        weights = alpha_to_weights(alpha)  # [R,S]
        color = jnp.sum(sampled_color * weights[..., None], axis=1)

        weights_bkgr = alpha_to_weights(alpha_bkgr)
        color_bkgr = jnp.sum(color_bkgr_s * weights_bkgr[..., None], axis=1)

        # eikonal + normal-orientation (inner lanes only)
        grad_norm = jnp.linalg.norm(grads, axis=-1)
        gradient_error = masked_mean((grad_norm - 1.0) ** 2, flat_inner)
        normal_dir = jnp.maximum(
            jnp.sum(grads * flat_dirs, axis=-1), 0.0) * flat_inner
        normal_ori_loss = jnp.sum(
            normal_dir.reshape(rn, sn) * weights, axis=1)

        # bkgr-vs-env consistency (renderer.py:799-821): candidate sample 64
        cand_idx = min(self.cfg["n_samples"], sn - 1)
        pts_cand = points[:, cand_idx, :]
        dirs_cand = dirs[:, 0, :]
        cand_inner = jnp.linalg.norm(pts_cand, axis=-1) <= 1.0
        safe_cand = jnp.where(cand_inner[:, None], pts_cand, jnp.zeros_like(pts_cand))
        color_spec = linear_to_srgb(self.color_net.apply(
            params["shade"], safe_cand, dirs_cand,
            method=AppShadingNetwork.outer_light_for_dir))

        acc = jnp.sum(weights, axis=-1)
        # SDF-branch-only opacity: the acc target for real-capture mask
        # supervision (with a NeRF++ background the TOTAL acc saturates at 1
        # on every pixel, so only the inner-branch mass identifies the
        # silhouette; see train_outputs)
        acc_sdf = jnp.sum(weights * inner_mask, axis=-1)
        if is_nerf:
            color = color + (1.0 - acc[..., None])

        outputs: Dict[str, Any] = {
            "ray_rgb": jnp.clip(color, 0.0, 1.0),
            "gradient_error": gradient_error,
            "loss_normal": jnp.mean(normal_ori_loss),
            "acc": acc,
            "acc_sdf": acc_sdf,
            "color_bkgr": color_bkgr,
            "color_spec": color_spec,
            "spec_mask": cand_inner,
            "std": jnp.mean(1.0 / inv_s),
        }

        # init SDF regularizer (first 1000 steps)
        reg_mask = jnp.linalg.norm(flat_pts, axis=-1) < 1.2

        def init_reg(_):
            return self._init_sdf_reg(
                jnp.where(reg_mask[:, None], flat_pts, 2.0 * jnp.ones_like(flat_pts)),
                jnp.where(reg_mask, sdf, 10.0), step.astype(jnp.float32))

        small, large = jax.lax.cond(step < 1000, init_reg,
                                    lambda _: (jnp.zeros(()), jnp.zeros(())), None)
        outputs["loss_sdf_small"] = small
        outputs["loss_sdf_large"] = large

        if self.cfg["apply_occ_loss"]:
            reflective = occ_info["reflective"]

            def occ(_):
                return self._occ_loss(params, flat_pts, sdf, grads, flat_dirs,
                                      occ_info["occ_prob"], reflective,
                                      flat_inner, rng)

            outputs["loss_occ"] = jax.lax.cond(
                step >= self.cfg["occ_loss_step"], occ,
                lambda _: jnp.zeros(()), None)

        outputs["transmission"] = masked_mean(
            occ_info["transmission_weight"][..., 0], flat_inner)
        outputs["metallic"] = masked_mean(occ_info["metallic"][..., 0], flat_inner)

        if not is_train:
            outputs.update(self.compute_validation_info(
                params, z_vals, rays_o, rays_d, weights, human_poses, step,
                with_inter=with_inter))
        return outputs

    def render_core_partitioned(self, params, rays_o, rays_d, z_vals,
                                sphere_hit, human_poses, cos_anneal_ratio,
                                step, rng, is_train: bool, is_nerf: bool,
                                with_inter: bool = False):
        """``render_core`` over the static sample partition produced by
        ``sample_ray_partitioned``: SDF + shading run ONLY on the inner
        slice, the NeRF++ background ONLY on the outer slices — the exact
        compaction the reference gets from boolean indexing
        (renderer.py:756-779), with zero gather cost because the partition
        is static."""
        cfg = self.cfg
        F = cfg["n_front_samples"]
        I = cfg["n_samples"] + cfg["n_importance"]
        rn, sn = z_vals.shape
        B = sn - F - I

        dists = z_vals[:, 1:] - z_vals[:, :-1]
        dists = jnp.concatenate([dists, dists[:, -1:]], axis=-1)
        mid_z = z_vals + dists * 0.5
        points = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
        dirs = jnp.broadcast_to(normalize(rays_d)[:, None, :], points.shape)

        pts_in = points[:, F:F + I].reshape(-1, 3)
        dirs_in = dirs[:, F:F + I].reshape(-1, 3)
        dists_in = dists[:, F:F + I].reshape(-1)
        pts_out = jnp.concatenate([points[:, :F], points[:, F + I:]], 1)
        dirs_out = jnp.concatenate([dirs[:, :F], dirs[:, F + I:]], 1)
        dists_out = jnp.concatenate([dists[:, :F], dists[:, F + I:]], 1)

        # outer branch (NeRF++) on the F + B outer samples only
        alpha_nerf, color_nerf = self.compute_density_alpha(
            params, pts_out.reshape(-1, 3), dists_out.reshape(-1),
            -dirs_out.reshape(-1, 3))
        alpha_nerf = alpha_nerf.reshape(rn, F + B)
        color_nerf = color_nerf.reshape(rn, F + B, 3)

        # inner branch (SDF + shading) on the I chord samples only
        alpha_sdf, grads, feats, inv_s, sdf = self.compute_sdf_alpha(
            params, pts_in, dists_in, dirs_in, cos_anneal_ratio, step)
        if human_poses is not None:
            hp = jnp.broadcast_to(human_poses[:, None],
                                  (rn, I, 3, 4)).reshape(-1, 3, 4)
        else:
            hp = None
        color_sdf, occ_info = self.color_net.apply(
            params["shade"], pts_in, grads, -dirs_in, feats, hp)
        # rays missing the sphere carry a degenerate (zero-length) chord:
        # their inner samples must not absorb anything
        alpha_sdf = alpha_sdf.reshape(rn, I) * sphere_hit[:, None]
        color_sdf = color_sdf.reshape(rn, I, 3)

        alpha = jnp.concatenate(
            [alpha_nerf[:, :F], alpha_sdf, alpha_nerf[:, F:]], axis=1)
        sampled_color = jnp.concatenate(
            [color_nerf[:, :F], color_sdf, color_nerf[:, F:]], axis=1)
        alpha_bkgr = jnp.concatenate(
            [alpha_nerf[:, :F], jnp.zeros((rn, I), alpha.dtype),
             alpha_nerf[:, F:]], axis=1)
        color_bkgr_s = jnp.concatenate(
            [color_nerf[:, :F], jnp.zeros((rn, I, 3), alpha.dtype),
             color_nerf[:, F:]], axis=1)

        weights = alpha_to_weights(alpha)  # [R,S]
        color = jnp.sum(sampled_color * weights[..., None], axis=1)
        weights_bkgr = alpha_to_weights(alpha_bkgr)
        color_bkgr = jnp.sum(color_bkgr_s * weights_bkgr[..., None], axis=1)

        # eikonal + normal-orientation on the inner lanes (mid-z shifts can
        # push a chord sample epsilon-outside, so keep the radius test)
        flat_inner = ((jnp.linalg.norm(pts_in, axis=-1) <= 1.0)
                      & jnp.repeat(sphere_hit, I))
        grad_norm = jnp.linalg.norm(grads, axis=-1)
        gradient_error = masked_mean((grad_norm - 1.0) ** 2, flat_inner)
        normal_dir = jnp.maximum(
            jnp.sum(grads * dirs_in, axis=-1), 0.0) * flat_inner
        normal_ori_loss = jnp.sum(
            normal_dir.reshape(rn, I) * weights[:, F:F + I], axis=1)

        # bkgr-vs-env consistency (renderer.py:799-821): candidate = the
        # sample just past the uniform chord section
        cand_idx = F + min(cfg["n_samples"], I - 1)
        pts_cand = points[:, cand_idx, :]
        dirs_cand = dirs[:, 0, :]
        cand_inner = (jnp.linalg.norm(pts_cand, axis=-1) <= 1.0) & sphere_hit
        safe_cand = jnp.where(cand_inner[:, None], pts_cand,
                              jnp.zeros_like(pts_cand))
        color_spec = linear_to_srgb(self.color_net.apply(
            params["shade"], safe_cand, dirs_cand,
            method=AppShadingNetwork.outer_light_for_dir))

        acc = jnp.sum(weights, axis=-1)
        # SDF-branch-only opacity (see render_core): the SDF branch is
        # exactly the static chord slice [F, F+I)
        acc_sdf = jnp.sum(weights[:, F:F + I], axis=-1)
        if is_nerf:
            color = color + (1.0 - acc[..., None])

        outputs: Dict[str, Any] = {
            "ray_rgb": jnp.clip(color, 0.0, 1.0),
            "gradient_error": gradient_error,
            "loss_normal": jnp.mean(normal_ori_loss),
            "acc": acc,
            "acc_sdf": acc_sdf,
            "color_bkgr": color_bkgr,
            "color_spec": color_spec,
            "spec_mask": cand_inner,
            "std": jnp.mean(1.0 / inv_s),
        }

        # init SDF regularizer (first 1000 steps).  The "large" half needs
        # SDF values at outer points near the sphere (1.05 < r < 1.2) which
        # the partitioned hot path never evaluates — so evaluate them inside
        # the cond branch, where they cost nothing after step 1000.
        def init_reg(_):
            out_flat = pts_out.reshape(-1, 3)
            reg_mask = jnp.linalg.norm(out_flat, axis=-1) < 1.2
            safe_out = jnp.where(reg_mask[:, None], out_flat,
                                 2.0 * jnp.ones_like(out_flat))
            sdf_out = self.sdf(params, safe_out)[..., 0]
            all_pts = jnp.concatenate([pts_in, safe_out], 0)
            all_sdf = jnp.concatenate(
                [sdf, jnp.where(reg_mask, sdf_out, 10.0)], 0)
            return self._init_sdf_reg(all_pts, all_sdf,
                                      step.astype(jnp.float32))

        small, large = jax.lax.cond(step < 1000, init_reg,
                                    lambda _: (jnp.zeros(()), jnp.zeros(())),
                                    None)
        outputs["loss_sdf_small"] = small
        outputs["loss_sdf_large"] = large

        if cfg["apply_occ_loss"]:
            reflective = occ_info["reflective"]

            def occ(_):
                return self._occ_loss(params, pts_in, sdf, grads, dirs_in,
                                      occ_info["occ_prob"], reflective,
                                      flat_inner, rng)

            outputs["loss_occ"] = jax.lax.cond(
                step >= cfg["occ_loss_step"], occ,
                lambda _: jnp.zeros(()), None)

        outputs["transmission"] = masked_mean(
            occ_info["transmission_weight"][..., 0], flat_inner)
        outputs["metallic"] = masked_mean(occ_info["metallic"][..., 0],
                                          flat_inner)

        if not is_train:
            outputs.update(self.compute_validation_info(
                params, z_vals, rays_o, rays_d, weights, human_poses, step,
                with_inter=with_inter))
        return outputs

    def compute_validation_info(self, params, z_vals, rays_o, rays_d, weights,
                                human_poses, step, with_inter=True):
        """renderer.py:649-668 — surface-point channels for validation."""
        depth = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
        points = depth * rays_d + rays_o
        sdf, feats, grads = self.sdf_all(params, points)
        inner = (jnp.linalg.norm(points, axis=-1, keepdims=True) <= 1.0)
        outputs = {
            "depth": depth,
            "normal": ((normalize(grads) + 1.0) * 0.5) * inner,
        }
        if not with_inter:
            return outputs
        hp = human_poses if human_poses is not None else None
        _, occ_info, inter = self.color_net.apply(
            params["shade"], points, grads, -normalize(rays_d), feats, hp,
            inter_results=True)
        sdf_fn = lambda x: self.sdf(params, x)
        inv_fn = lambda x: self.inv_s(params, x)
        _, occ_prob_hit, _ = get_intersection(
            sdf_fn, inv_fn, points, occ_info["reflective"], sn0=128, sn1=9)
        outputs["occ_prob_gt"] = jnp.sum(occ_prob_hit, axis=-1, keepdims=True)
        for k, v in inter.items():
            outputs[k] = v * inner
        return outputs

    # ----- public entry points -----------------------------------------
    def render(self, params, rays_o, rays_d, near, far, human_poses, rng,
               step, cos_anneal_ratio=0.0, perturb_overwrite=-1.0,
               is_train=True, is_nerf=False, with_inter=False):
        """renderer.py:627-647."""
        perturb = self.cfg["perturb"]
        if perturb_overwrite >= 0:
            perturb = perturb_overwrite
        r_sample, r_core = jax.random.split(rng)
        if self.cfg["partition_samples"]:
            z_vals, sphere_hit = self.sample_ray_partitioned(
                params, rays_o, rays_d, near, far, perturb, r_sample)
            return self.render_core_partitioned(
                params, rays_o, rays_d, z_vals, sphere_hit, human_poses,
                cos_anneal_ratio, step, r_core, is_train=is_train,
                is_nerf=is_nerf, with_inter=with_inter)
        z_vals = self.sample_ray(params, rays_o, rays_d, near, far, perturb,
                                 r_sample)
        return self.render_core(params, rays_o, rays_d, z_vals, human_poses,
                                cos_anneal_ratio, step, r_core,
                                is_train=is_train, is_nerf=is_nerf,
                                with_inter=with_inter)

    def get_anneal_val(self, step):
        if self.cfg["anneal_end"] < 0:
            return jnp.asarray(1.0)
        return jnp.minimum(1.0, step / self.cfg["anneal_end"])

    def train_outputs(self, params, batch, rng, step):
        """One training forward: render + data losses.

        batch: rays_o, rays_d, near, far, rgbs, [masks], [human_poses].
        """
        is_nerf = self.cfg["is_nerf"]
        outputs = self.render(
            params, batch["rays_o"], batch["rays_d"], batch["near"],
            batch["far"], batch.get("human_poses"), rng,
            step, cos_anneal_ratio=self.get_anneal_val(step),
            is_train=True, is_nerf=is_nerf)
        outputs["loss_rgb"] = self.compute_rgb_loss(outputs["ray_rgb"], batch["rgbs"])
        if "masks" in batch and (is_nerf or self.cfg.get("use_mask_loss",
                                                         False)):
            # nerf convention: dataset alpha vs TOTAL acc (white-fill
            # compositing).  Real-capture bootstrap (use_mask_loss): the
            # rendered silhouette from the first-pass mesh supervises the
            # SDF-branch opacity only — total acc saturates at 1 under the
            # NeRF++ background (round-5 bootstrap, VERDICT item 1;
            # reference contract render_mask.py + mask_erosion.py:29-35)
            target = outputs["acc"] if is_nerf else outputs["acc_sdf"]
            outputs["loss_mask"] = jnp.mean(
                jnp.abs(batch["masks"] - target))
        return outputs

    def nvs(self, params, pose, K, h, w, chunk: int = 1024, step: int = 300000):
        """Novel-view synthesis helper (renderer.py:295-328): render a full
        image from an arbitrary (pose [3,4] world->cam, K) camera."""
        import numpy as np
        from nunerf_tpu.data.ray_store import construct_ray_batch

        info = {"imgs": np.zeros((1, h, w, 3), np.float32),
                "Ks": K[None].astype(np.float32),
                "poses": pose[None].astype(np.float32)}
        batch, _, _ = construct_ray_batch(info)

        if not hasattr(self, "_nvs_chunk_fn"):
            def _chunk_render(params, cur, rng, step):
                return self.render(params, cur["rays_o"], cur["rays_d"],
                                   cur["near"], cur["far"], cur["human_poses"],
                                   rng, step, cos_anneal_ratio=1.0,
                                   perturb_overwrite=0.0, is_train=False,
                                   with_inter=False)["ray_rgb"]
            self._nvs_chunk_fn = jax.jit(_chunk_render)

        out = []
        rng = jax.random.PRNGKey(0)
        step = jnp.asarray(step, jnp.int32)
        for i0 in range(0, h * w, chunk):
            cur = {k: jnp.asarray(v[i0:i0 + chunk]) for k, v in batch.items()}
            n = cur["rays_o"].shape[0]
            if n < chunk:  # pad tail for fixed shapes
                cur = {k: jnp.concatenate(
                    [v, jnp.repeat(v[-1:], chunk - n, 0)], 0)
                    for k, v in cur.items()}
            res = self._nvs_chunk_fn(params, cur, rng, step)
            out.append(np.asarray(res)[:n])
        return np.concatenate(out, 0).reshape(h, w, 3)

    def test_outputs(self, params, batch, rng, step):
        """Full-channel eval forward (renderer.py:414-461 per-chunk body)."""
        outputs = self.render(
            params, batch["rays_o"], batch["rays_d"], batch["near"],
            batch["far"], batch.get("human_poses"), rng, step,
            cos_anneal_ratio=1.0, perturb_overwrite=0.0,
            is_train=False, is_nerf=self.cfg["is_nerf"], with_inter=True)
        outputs["loss_rgb"] = self.compute_rgb_loss(outputs["ray_rgb"], batch["rgbs"])
        return outputs
