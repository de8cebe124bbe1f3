"""Stage-2 renderer (zero-thickness): inner geometry through traced glass.

Re-design of the reference zero-thickness ``Stage2Renderer``
(``network/renderer_zerothick.py:868-2060``): camera rays refract through the
extracted outer mesh (single-interface Snell per hit), and the inner object is
a second NeuS SDF rendered along the refracted path segments with
transmittance chaining.

Reference flow vs TPU re-design:
* ``ray_trace`` (:1571-1828) loops 3 bounces with boolean-mask compaction and
  a Python OptiX round trip per bounce -> here the 3 bounces are statically
  unrolled over the on-chip intersector with ``converged``/``tir`` masks
  carried per lane (no compaction, no host sync);
* per-segment sampling: outside segments get ``n_samples_outer`` uniform
  samples to the hit (or coarse+NeRF-importance background samples on miss,
  :1762-1799); the inside-glass segment gets NeuS-upsampled samples from the
  inner SDF (:1745-1760) — both branches are computed fixed-shape and
  selected by the hit mask;
* ``render_core`` (:1835-2011) accumulates linear-space radiance with
  transmittance chaining across segments and interface shading through the
  frozen stage-1 heads (``AppShadingNetwork_S2``);
* TIR masks (:1662-1669) propagate backward through the converged chain and
  mask the rgb loss (:1247,1273).

Stage-1 parameters ride in ``params['frozen']`` under ``stop_gradient`` (the
trainer gives that subtree a zero optimizer), so one pytree flows through the
sharded train step without baking 10M constants into the executable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nunerf_tpu.config import STAGE2_DEFAULTS, merge_cfg, load_cfg
from nunerf_tpu.fields.aux import IoRNetwork, ThicknessNetwork
from nunerf_tpu.fields.sdf import SDFNetwork
from nunerf_tpu.fields.shading import AppShadingNetwork
from nunerf_tpu.fields.variance import SingleVarianceNetwork
from nunerf_tpu.models.stage1 import ShapeRenderer, masked_mean
from nunerf_tpu.ops.geometry import normalize, safe_norm, safe_sqrt
from nunerf_tpu.ops.sampling import merge_z_vals, neus_upsample, sample_pdf
from nunerf_tpu.ops.srgb import linear_to_srgb, srgb_to_linear
from nunerf_tpu.ops.volume import alpha_to_weights, exclusive_cumprod
from nunerf_tpu.tracing.scene import Scene

ZERO_THICK_DEFAULTS = dict(
    STAGE2_DEFAULTS,
    n_samples_outer=256,      # outside segments (renderer_zerothick.py:1729)
    n_bg_importance=64,       # importance samples on miss (:1799)
    bg_z_max=64.0,            # coarse background range [0.1, 64] (:1767)
    bg_tail_samples=32,       # stage-1's n_bg_samples (renderer.py:126)
    bg_near0=0.8,             # stage-1's nerf-convention near (renderer.py:389)
    n_samples_inner=64,       # inside-glass base samples (:1734)
    inner_up_rounds=2,        # NeuS upsample rounds (:1752)
    inner_up_each=32,
    seg_far=4.5,              # miss-segment length (:1727)
    max_bounces=3,
)


class Stage2Renderer:
    """Zero-thickness stage-2.  Trainable: inner SDF + deviation + inner
    shader + IoR field (+ vestigial IoR-interior/thickness fields and the
    10-vector IORs parameter, kept for checkpoint parity)."""

    def __init__(self, cfg: Dict[str, Any], scene: Optional[Scene] = None,
                 stage1_params=None):
        self.cfg = merge_cfg(ZERO_THICK_DEFAULTS, cfg)
        shader_cfg = self.cfg.get("shader_config") or {}

        # frozen stage-1 stack (module defs; params come from the checkpoint).
        # The frozen nets inherit stage-2's precision choice: bf16 compute on
        # the frozen background NeRF is stage-2's main throughput lever.
        s1_cfg = dict(self.cfg.get("stage1_cfg") or {})
        if self.cfg.get("stage1_cfg_dir"):
            s1_cfg = load_cfg(self.cfg["stage1_cfg_dir"])
        s1_cfg = dict(s1_cfg,
                      mixed_precision=self.cfg.get("mixed_precision", True))
        self.stage1 = ShapeRenderer(s1_cfg)

        if stage1_params is None and self.cfg.get("stage1_ckpt_dir"):
            from nunerf_tpu.train.trainer import load_checkpoint
            _, stage1_params, _, _ = load_checkpoint(self.cfg["stage1_ckpt_dir"])
        self.stage1_params = stage1_params

        if scene is None:
            scene = Scene(self.cfg["stage1_mesh_dir"],
                          curv_smooth_iters=self.cfg.get(
                              "curv_smooth_iters",
                              0 if self.cfg.get("zero_thickness", True)
                              else 20))
        self.scene = scene

        # trainable modules
        self.sdf_inner = SDFNetwork(
            d_out=self.cfg["sdf_d_out"], n_layers=self.cfg["sdf_n_layers"],
            skip_in=(self.cfg["sdf_n_layers"] // 2,), multires=self.cfg["sdf_freq"],
            bias=self.cfg["sdf_bias"], geometric_init=self.cfg["geometry_init"],
            dtype=(jnp.bfloat16
                   if self.cfg.get("sdf_mixed_precision") else None))
        self.var_inner = SingleVarianceNetwork(
            init_val=self.cfg["inv_s_init"], activation=self.cfg["std_act"])
        dtype = jnp.bfloat16 if self.cfg.get("mixed_precision", True) else None
        # cfg inner_diffuse_only selects the reference's DiffuseInner inner
        # shader (field.py:1127-1283; metallic x0, transmission x0, pure
        # diffuse color).  Round-4 finding on the nested scene: the full
        # shader's transmission + view-dependent refrac_light let the
        # inflated inner surface FAKE the background seen through the glass
        # (a translucent veil in the validation dumps), which collapses the
        # carving gradient — with an opaque lambertian inner object the
        # diffuse shader is the physically right capacity.  The parameter
        # tree is identical either way, so a checkpointed run can resume
        # with the flag flipped.
        self.color_inner = AppShadingNetwork(
            sphere_direction=bool(shader_cfg.get("sphere_direction", False)),
            human_light=False, dtype=dtype,
            diffuse_only=bool(self.cfg.get("inner_diffuse_only", False)))
        self.ior_net = IoRNetwork()
        self.ior_int_net = IoRNetwork()
        self.thickness_net = ThicknessNetwork()
        fused_sdf = self.cfg.get("fused_sdf")
        if fused_sdf is None:
            from nunerf_tpu.ops.fused_mlp import use_fused_sdf
            fused_sdf = use_fused_sdf()
        self.fused_sdf = bool(fused_sdf)

    frozen_keys = ("frozen",)

    @staticmethod
    def _is_internal(i: int) -> bool:
        """Zero-thickness: odd interfaces are internal
        (renderer_zerothick.py:1934); the shell variant overrides to
        ``i != 0`` (renderer.py:2272)."""
        return i % 2 != 0

    # ------------------------------------------------------------------
    def init_params(self, rng) -> Dict[str, Any]:
        r = jax.random.split(rng, 6)
        d3 = jnp.zeros((1, 3))
        feats = jnp.zeros((1, 256))
        train = {
            "sdf_inner": self.sdf_inner.init(r[0], d3),
            "var_inner": self.var_inner.init(r[1], d3),
            "shade_inner": self.color_inner.init(r[2], d3, d3, d3, feats),
            "ior": self.ior_net.init(r[3], d3),
            "ior_int": self.ior_int_net.init(r[4], d3),
            "thickness": self.thickness_net.init(r[5], d3),
            "iors_vec": jnp.zeros((10,)),  # vestigial (renderer_zerothick.py:929)
        }
        if self.cfg.get("learn_absorption", False):
            # per-channel Beer-Lambert coefficient for the glass medium,
            # kappa = softplus(raw) (net-new vs the reference, which models
            # no absorption: renderer.py:1727-1742 attenuates only via the
            # frozen shader's refraction_coefficient).  Init near zero
            # absorption (raw -2 -> kappa 0.127).
            train["absorption"] = jnp.full((3,), -2.0, jnp.float32)
        if self.stage1_params is None:
            raise ValueError("stage-2 requires stage-1 params "
                             "(stage1_ckpt_dir or stage1_params)")
        return {"train": train, "frozen": self.stage1_params}

    # ----- frozen stage-1 helpers --------------------------------------
    def stage1_sdf(self, pts, params=None):
        p = params if params is not None else self.stage1_params
        return self.stage1.sdf_net.apply(p["sdf"], pts)[..., :1]

    def inner_sdf(self, params, pts):
        return self.sdf_inner.apply(params["train"]["sdf_inner"], pts)[..., :1]

    # ----- inv_s hardening floor -----------------------------------------
    def _inv_s_floor(self, step):
        """Scheduled lower bound on the inner NeuS inv_s, or None (= off).

        The reference hardens inv_s into the hundreds over its 150k-step
        stage-2 schedule (renderer_zerothick.py:1490-1528 + 150k steps,
        configs/stage2/nerf/spherepot.yaml:41); the compressed schedules here
        plateau near ~126, leaving a soft silhouette that costs ~2.6 dB on
        the nested test split (round-4 eval).  The floor ramps geometrically
        from ``inv_s_floor_base`` to ``inv_s_floor_max`` between
        ``inv_s_floor_start`` and ``inv_s_floor_end`` and is applied as
        ``max(learned, floor)`` — the variance net can only sharpen further.
        Default off (reference parity)."""
        fmax = self.cfg.get("inv_s_floor_max")
        if not fmax or step is None:
            return None
        start = self.cfg.get("inv_s_floor_start", 0)
        end = self.cfg.get("inv_s_floor_end",
                           self.cfg.get("total_step", 30000))
        base = float(self.cfg.get("inv_s_floor_base", 32.0))
        t = jnp.clip((step - start) / max(end - start, 1), 0.0, 1.0)
        floor = base * (float(fmax) / base) ** t
        return jnp.where(jnp.asarray(step) < start, 0.0, floor)

    # ----- freeze gates -------------------------------------------------
    def _freeze_flag(self, train, step, step_key, thr_key):
        """Traced bool: hold a physical field (IoR / thickness) at its init.

        ``cfg[step_key]``: freeze while step < value; ``cfg[thr_key]``:
        additionally freeze until the inner NeuS has hardened
        (inv_s >= threshold).  Returns None when no gate is configured —
        reference-parity behavior (the reference never freezes).  Rationale:
        while the inner geometry is soft, a painted light field out-competes
        physics and the field drifts to a trivial value (measured round 3:
        IoR 1.5 -> 1.19, shell thickness 0.005 -> 0.0007)."""
        fs = self.cfg.get(step_key, 0) or 0
        thr = self.cfg.get(thr_key)
        if step is None or (not fs and not thr):
            return None
        frozen = jnp.asarray(step < fs)
        if thr:
            inv_s_now = jax.lax.stop_gradient(
                self.var_inner.apply(train["var_inner"],
                                     jnp.zeros((1, 3)))[0, 0])
            # the gate asks "has the rendered surface hardened?" — under an
            # inv_s floor the rendering hardness is the floored value
            floor = self._inv_s_floor(step)
            if floor is not None:
                inv_s_now = jnp.maximum(inv_s_now, floor)
            frozen = frozen | (inv_s_now < thr)
        return frozen

    @staticmethod
    def _maybe_freeze(val, frozen):
        if frozen is None:
            return val
        return jax.lax.cond(frozen,
                            lambda v: jax.lax.stop_gradient(v),
                            lambda v: v, val)

    # ----- ray tracing --------------------------------------------------
    def ray_trace(self, params, rays_o, rays_d, step=None):
        """3-bounce Snell trace through the outer mesh
        (renderer_zerothick.py:1571-1703), fixed-shape.

        Returns per-bounce dicts and the combined tir mask.

        ``freeze_ior_step`` (cfg, default 0 = reference behavior): while the
        inner SDF is still a wall at the entry interface, the interior path
        length is ~0 and nothing constrains the IoR field — it drifts (to
        eta=1, straight rays, on the nested scene), after which a straight-
        ray light field painted on the wall beats true geometry and carving
        never starts.  Freezing the IoR at its init (sigmoid midpoint 0.5 ->
        eta = 1/1.5, the map's designed-in glass prior,
        renderer_zerothick.py:1642) until geometry stabilizes removes that
        failure mode.
        """
        train = params["train"]
        # round-3 finding (docs/nested_walkthrough.md): releasing the IoR at
        # a fixed step lets it drift toward eta=1 while NeuS is still soft
        # (measured: IoR 1.5 -> 1.19 by 40k with inv_s only 52), and the
        # inflated geometry compensates the under-bent rays — hence the
        # optional inv_s gate on top of the fixed step (see _freeze_flag).
        frozen_ior = self._freeze_flag(train, step,
                                       "freeze_ior_step", "freeze_ior_inv_s")
        bounces = []
        start, direc = rays_o, normalize(rays_d)
        active = jnp.ones(rays_o.shape[0], bool)
        tir_bad = jnp.zeros(rays_o.shape[0], bool)

        for i in range(self.cfg["max_bounces"]):
            outside = (i % 2 == 0)
            res = self.scene.dintersect(start, direc)
            hit = res["hit"] & active
            normal = res["normal"] if outside else -res["normal"]
            # robustness to mesh winding: the interface normal must oppose
            # the incoming ray (outward meshes satisfy this already; an
            # inward-wound mesh would otherwise bend refracted rays back out
            # of the glass and silently starve the inner object of gradient)
            opposes = jnp.sum(normal * -direc, axis=-1, keepdims=True) >= 0
            normal = jnp.where(opposes, normal, -normal)

            cos_i = jnp.sum(normal * -direc, axis=-1, keepdims=True)
            sin2_i = 1.0 - cos_i * cos_i
            ior = self._maybe_freeze(
                self.ior_net.apply(train["ior"], res["pos"]), frozen_ior)
            eta = 1.0 / (ior + 1.0)           # IoR map (:1642-1643)
            if not outside:
                eta = 1.0 / eta               # reciprocal when exiting (:1653)

            tir_here = (eta * eta * sin2_i)[..., 0] > 0.999
            conv = hit & ~tir_here
            tir_bad = tir_bad | (hit & tir_here)

            sin2_t = jnp.clip(eta * eta * sin2_i, 0.0, 1.0)
            next_dir_un = (eta * direc
                           + (eta * cos_i - safe_sqrt(1.0 - sin2_t)) * normal)
            next_start = res["pos"] + next_dir_un * 1e-5
            next_dir = next_dir_un / (
                safe_norm(next_dir_un, keepdims=True) + 1e-4)

            bounces.append({
                "start": start, "dir": direc, "active": active,
                "hit": hit, "conv": conv, "pos": res["pos"],
                "normal": normal, "eta": eta,
                "next_dir": next_dir, "ior_raw": ior,
                "ior_frozen": jnp.asarray(
                    frozen_ior if frozen_ior is not None else 0, jnp.float32),
            })
            start, direc, active = next_start, next_dir, conv

        return bounces, ~tir_bad

    # ----- per-segment sampling ----------------------------------------
    def _stage1_bg_z(self, n_total: int, near: float):
        """Stage-1's exact background z-law from a segment origin: linear
        [near, far] then the inverse-depth tail stage-1 trained its NeRF++
        on (z = far/flip(linspace(1e-3, 1-1/(n_bg+1))) + 1/n_bg,
        stage1.sample_ray / renderer.py:585-625, far = 4.5 for the nerf
        convention, renderer.py:389).  The frozen background's radiance mass
        lives exactly where stage-1's sampling put it; any other law
        mis-integrates the frozen field and starves escaped rays."""
        cfg = self.cfg
        far = cfg["seg_far"]
        n_tail = min(cfg["bg_tail_samples"], n_total // 2)
        n_near = n_total - n_tail
        z_near = jnp.linspace(near, far, n_near)
        t = jnp.linspace(1e-3, 1.0 - 1.0 / (n_tail + 1.0), n_tail)
        z_tail = far / jnp.flip(t) + 1.0 / n_tail
        return jnp.concatenate([z_near, z_tail], -1)  # ascending [n_near+n_tail]

    def _stage1_bg_z_lanes(self, n_total: int, near: jnp.ndarray):
        """Per-lane variant of ``_stage1_bg_z`` (sphere_clip_outer): the
        linear head starts at each lane's own near; the inverse-depth tail
        is shared (it lives beyond ``far`` where no clip applies)."""
        cfg = self.cfg
        far = cfg["seg_far"]
        n_tail = min(cfg["bg_tail_samples"], n_total // 2)
        n_near = n_total - n_tail
        frac = jnp.linspace(0.0, 1.0, n_near)[None, :]
        z_near = near[:, None] + frac * jnp.maximum(far - near[:, None], 1e-3)
        t = jnp.linspace(1e-3, 1.0 - 1.0 / (n_tail + 1.0), n_tail)
        z_tail = far / jnp.flip(t) + 1.0 / n_tail
        z_tail = jnp.broadcast_to(z_tail[None, :], (near.shape[0], n_tail))
        return jnp.concatenate([z_near, z_tail], -1)

    def _sample_outer_segment(self, params, b, rng, seg_index: int = 0):
        """Outside segment (k != 1): uniform-to-hit on hit lanes; on miss,
        background samples along the escaped ray.

        Miss-lane law (cfg bg_sampling):
          'stage1_exact' (default): stage-1's own z-law (see _stage1_bg_z);
            escaped lanes then reproduce the frozen background EXACTLY as
            stage-1 rendered it (the fill/compositing half lives in
            ``render``).  No importance round needed — stage-1's law is
            deterministic — which also drops a full density sweep.
          'stage1': round-1 heuristic law + frozen-NeRF importance round.
          'linear64': the reference law, linspace(0.1, 64) + importance
            (renderer_zerothick.py:1764-1799), for exact parity runs.
        """
        cfg = self.cfg
        n = cfg["n_samples_outer"]
        n_imp = cfg["n_bg_importance"]
        start, direc = b["start"], b["dir"]
        rn = start.shape[0]

        end_hit = b["pos"]
        sphere_clip = bool(cfg.get("sphere_clip_outer", False))
        if sphere_clip and seg_index == 0:
            # Sphere-clipped z-law (docs/perf_notes.md §4, landed round 5):
            # outer-segment samples past the unit-sphere entry are
            # where-masked to zero in render() (frozen NeRF only counts
            # outside the sphere), so ~40% of the frozen-NeRF evals were
            # dead.  Clip the hit-lane sample domain at the sphere entry —
            # every removed sample had alpha exactly 0, the freed budget
            # buys the same resolution with fewer samples (configs drop
            # n_samples_outer alongside this flag).
            ob = jnp.sum(start * direc, -1, keepdims=True)
            disc = ob * ob - (jnp.sum(start * start, -1, keepdims=True) - 1.0)
            t_in = -ob - jnp.sqrt(jnp.maximum(disc, 0.0))
            t_hit = jnp.linalg.norm(end_hit - start, axis=-1, keepdims=True)
            t_end = jnp.where((disc[..., 0:1] > 0) & (t_in > 0),
                              jnp.minimum(t_in, t_hit), t_hit)
            end_hit = start + direc * t_end
        z_hit = jnp.linspace(0.0, 1.0, n)[None, :, None]
        pts_hit = start[:, None, :] + (end_hit - start)[:, None, :] * z_hit

        mode = cfg.get("bg_sampling", "stage1_exact")
        if mode == "stage1_exact":
            # bounce-0 miss lanes ARE stage-1 rays: reuse stage-1's near.
            near = cfg["bg_near0"] if seg_index == 0 else 1e-3
            if sphere_clip and seg_index != 0:
                # exit-segment miss lanes start ON the mesh, inside the unit
                # sphere: everything before the sphere exit is where-masked
                # dead weight.  Per-lane near = the sphere-exit distance.
                ob = jnp.sum(start * direc, -1)
                disc = ob * ob - (jnp.sum(start * start, -1) - 1.0)
                t_out = -ob + jnp.sqrt(jnp.maximum(disc, 0.0))
                near_lane = jnp.where((disc > 0) & (t_out > 0),
                                      t_out + 1e-3, near)      # [rn]
                z_miss = self._stage1_bg_z_lanes(n, near_lane)
            else:
                z_miss = jnp.broadcast_to(
                    self._stage1_bg_z(n, near)[None, :], (rn, n))
            pts_miss = start[:, None, :] + direc[:, None, :] * z_miss[..., None]
            return jnp.where(b["hit"][:, None, None], pts_hit, pts_miss)

        # importance-sampled laws: coarse z + one round from the frozen
        # stage-1 background nerf weights (density-only fast path,
        # NeRFNetwork.density, field.py:293-305).
        n_coarse = n - n_imp
        if mode == "stage1":
            n_tail = n_coarse // 3
            n_near = n_coarse - n_tail
            z_near = jnp.linspace(0.1, 4.5, n_near)
            t = jnp.linspace(1e-3, 1.0 - 1.0 / (n_tail + 1.0), n_tail)
            z_tail = 4.5 / jnp.flip(t) + 1.0 / n_tail
            zc = jnp.concatenate([z_near, jnp.flip(z_tail)], -1)
            zc = jnp.sort(zc)
        else:
            zc = jnp.linspace(0.1, cfg["bg_z_max"], n_coarse)
        zc = jnp.broadcast_to(zc[None, :], (rn, n_coarse))
        pts_c = start[:, None, :] + direc[:, None, :] * zc[..., None]
        dists = jnp.concatenate([zc[:, 1:] - zc[:, :-1],
                                 (zc[:, -1:] - zc[:, -2:-1])], -1)
        alpha = self._density_only_alpha(params, pts_c.reshape(-1, 3),
                                         dists.reshape(-1))
        alpha = jax.lax.stop_gradient(alpha.reshape(rn, n_coarse))
        weights = alpha_to_weights(alpha)
        z_new = sample_pdf(zc, weights[:, :-1], n_imp, det=True)
        z_miss, _ = merge_z_vals(zc, jax.lax.stop_gradient(z_new), None, None)
        pts_miss = start[:, None, :] + direc[:, None, :] * z_miss[..., None]

        return jnp.where(b["hit"][:, None, None], pts_hit, pts_miss)

    def _sample_inner_segment(self, params, b, rng):
        """Inside-glass segment (k == 1): NeuS-upsampled to the exit hit;
        uniform along seg_far on miss (:1734-1760).

        cfg ``inner_upsample_parity_quirk`` (default off) replicates the
        reference's unit mix-up for exact-parity runs: its upsample rounds
        treat chord FRACTIONS as world-space z (initial SDF sampled at
        fraction*chord, refined SDF sampled at fraction*1.0,
        renderer_zerothick.py:1739-1760); the default path keeps one
        consistent world-unit z throughout."""
        cfg = self.cfg
        quirk = bool(cfg.get("inner_upsample_parity_quirk", False))
        n0 = cfg["n_samples_inner"]
        rounds = cfg["inner_up_rounds"]
        each = cfg["inner_up_each"]
        n_total = n0 + rounds * each
        start, direc = b["start"], b["dir"]
        rn = start.shape[0]

        end_hit = b["pos"]
        seg_len = safe_norm(end_hit - start, keepdims=True)
        # z in world units toward the hit; miss lanes use seg_far span
        safe_len = jnp.where(b["hit"][:, None], seg_len, cfg["seg_far"])
        zf = jnp.linspace(0.0, 1.0, n0)[None, :]  # chord fractions
        z = zf * (jnp.ones_like(safe_len) if quirk else safe_len)  # [R,n0]

        def stop(x):
            return jax.lax.stop_gradient(x)

        pts = (start[:, None, :]
               + direc[:, None, :] * (zf * safe_len)[..., None])
        sdf = stop(self.inner_sdf(params, pts.reshape(-1, 3)).reshape(rn, n0))
        for i in range(rounds):
            sn = z.shape[1]
            if cfg.get("clip_sample_variance", True):
                inv_s = stop(self.var_inner.apply(
                    params["train"]["var_inner"], jnp.zeros((1, 3)))[0, 0])
                inv_s = jnp.minimum(inv_s, 64 * 2**i) * jnp.ones((rn, sn - 1))
            else:
                inv_s = jnp.ones((rn, sn - 1)) * 64 * 2**i
            new_z = neus_upsample(start, direc, z, sdf, each, inv_s)
            last = i + 1 == rounds
            if not last:
                new_pts = start[:, None, :] + direc[:, None, :] * new_z[..., None]
                new_sdf = stop(self.inner_sdf(params, new_pts.reshape(-1, 3))
                               .reshape(rn, new_z.shape[1]))
                z, sdf = merge_z_vals(z, new_z, sdf, new_sdf)
            else:
                z, _ = merge_z_vals(z, new_z, sdf, None)
        if quirk:
            z = z * safe_len  # fractions -> world, as sampled_vertices does

        # hit lanes: NeuS z (already spans [0, seg_len]); miss lanes: uniform
        z_miss = jnp.linspace(0.0, 1.0, n_total)[None, :] * cfg["seg_far"]
        z_final = jnp.where(b["hit"][:, None], z, z_miss)
        # endpoint must be exactly the interface on hit lanes
        z_final = jnp.where(b["hit"][:, None],
                            z_final.at[:, -1].set(seg_len[:, 0]), z_final)
        return start[:, None, :] + direc[:, None, :] * z_final[..., None]

    # ----- field helpers ------------------------------------------------
    def _density_alpha(self, params, points, dists, dirs):
        """Frozen stage-1 NeRF++ background (renderer_zerothick.py:1536-1544)."""
        frozen = jax.lax.stop_gradient(params["frozen"])
        norm = jnp.maximum(jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-3)
        pts4 = jnp.concatenate([points / norm, 1.0 / norm], axis=-1)
        density, color = self.stage1.outer_nerf.apply(frozen["nerf"], pts4, dirs)
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
        color = linear_to_srgb(jnp.exp(jnp.minimum(color, 5.0)))
        return alpha, color

    def _density_only_alpha(self, params, points, dists):
        """Background alpha without the color head (for importance weights)."""
        frozen = jax.lax.stop_gradient(params["frozen"])
        norm = jnp.maximum(jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-3)
        pts4 = jnp.concatenate([points / norm, 1.0 / norm], axis=-1)
        from nunerf_tpu.fields.nerf import NeRFNetwork
        density = self.stage1.outer_nerf.apply(frozen["nerf"], pts4,
                                               method=NeRFNetwork.density)
        return 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)

    def _inner_sdf_alpha(self, params, points, dists, dirs, cos_anneal, step):
        """Inner NeuS alpha (renderer_zerothick.py:1490-1528)."""
        train = params["train"]
        if self.fused_sdf:
            from nunerf_tpu.fields.sdf import fused_sdf_all
            sdf, feats, grads = fused_sdf_all(
                self.sdf_inner, train["sdf_inner"], points)
        else:
            from nunerf_tpu.fields.sdf import sdf_value_feature_grad
            sdf, feats, grads = sdf_value_feature_grad(
                self.sdf_inner.apply, train["sdf_inner"], points)
        inv_s = jnp.clip(self.var_inner.apply(train["var_inner"], points),
                         1e-6, 1e6)[..., 0]
        freeze = self.cfg.get("freeze_inv_s_step")
        if freeze is not None:
            inv_s = jax.lax.cond(step < freeze,
                                 lambda v: jax.lax.stop_gradient(v),
                                 lambda v: v, inv_s)
        floor = self._inv_s_floor(step)
        if floor is not None:
            inv_s = jnp.maximum(inv_s, floor)
        true_cos = jnp.sum(dirs * grads, axis=-1)
        iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal)
                     + jax.nn.relu(-true_cos) * cos_anneal)
        est_next = sdf + iter_cos * dists * 0.5
        est_prev = sdf - iter_cos * dists * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0, 1)
        return alpha, grads, feats, inv_s, sdf

    def _stage1_sdf_feats(self, params, points):
        """Frozen stage-1 SDF features+gradient at interface points
        (renderer_zerothick.py:1530-1534 ``compute_sdf``)."""
        frozen = jax.lax.stop_gradient(params["frozen"])
        out = self.stage1.sdf_net.apply(frozen["sdf"], points)
        return out[..., 1:]

    # ----- the core ------------------------------------------------------
    def render(self, params, rays_o, rays_d, rng, step, cos_anneal_ratio=0.0,
               is_train=True, with_inter=False):
        cfg = self.cfg
        rn = rays_o.shape[0]
        frozen = jax.lax.stop_gradient(params["frozen"])
        bounces, tir_mask = self.ray_trace(params, rays_o, rays_d, step)

        current_T = jnp.ones((rn, 3))
        total_color = jnp.zeros((rn, 3))
        outputs: Dict[str, Any] = {}
        normals_out = jnp.zeros((rn, 3))
        spec_color_out = jnp.zeros((rn, 3))
        spec_light_out = jnp.zeros((rn, 3))
        spec_ref_out = jnp.zeros((rn, 3))
        grad_err = jnp.zeros(())
        std_out = jnp.zeros(())

        # escaped lanes (active but no interface ahead) terminate at infinity:
        # for is_nerf scenes stage-1 closed every ray with a white (1-acc)
        # fill (stage1.render_core / renderer.py:843 ``color + (1-acc)``).
        # The reference's stage-2 drops that fill (its ``infinity_bkgr``
        # branch is commented out, renderer_zerothick.py:1959) so escaped and
        # through-glass rays are radiance-starved and the trainable inner SDF
        # grows bright shells to compensate.  We restore it (cfg
        # bg_infinity_fill, default on for is_nerf).
        infinity_fill = bool(cfg.get("bg_infinity_fill",
                                     cfg.get("is_nerf", False)))

        rngs = jax.random.split(rng, len(bounces))
        for i, b in enumerate(bounces):
            if i == 1:
                pts = self._sample_inner_segment(params, b, rngs[i])
            else:
                pts = self._sample_outer_segment(params, b, rngs[i],
                                                 seg_index=i)
            # volume samples exclude the interface endpoint (:1866-1871)
            pn = pts[:, :-1, :]
            n_s = pn.shape[1]
            d = pn[:, 1:] - pn[:, :-1]
            dists = safe_norm(d)
            dists = jnp.concatenate([dists, dists[:, -1:]], -1)
            dirs = jnp.broadcast_to(b["dir"][:, None, :], pn.shape)

            flat_p = pn.reshape(-1, 3)
            flat_d = dists.reshape(-1)
            flat_dir = dirs.reshape(-1, 3)
            alpha_nerf, color_nerf = self._density_alpha(
                params, flat_p, flat_d, -flat_dir)

            if i == 1:
                inner = jnp.linalg.norm(flat_p, axis=-1) <= 1.0
                a_sdf, grads_in, feats_in, inv_s_in, _sdf = \
                    self._inner_sdf_alpha(params, flat_p, flat_d, flat_dir,
                                          cos_anneal_ratio, step)
                c_sdf, _occ = self.color_inner.apply(
                    params["train"]["shade_inner"], flat_p, grads_in,
                    -flat_dir, feats_in, None)
                alpha = jnp.where(inner, a_sdf, alpha_nerf)
                scolor = jnp.where(inner[:, None], c_sdf, color_nerf)
                seg_mask = b["active"]
                gnorm = jnp.linalg.norm(grads_in, axis=-1)
                grad_err = masked_mean(
                    (gnorm - 1.0) ** 2,
                    inner & jnp.repeat(seg_mask, n_s))
                std_out = jnp.mean(1.0 / inv_s_in)
            else:
                outer = jnp.linalg.norm(flat_p, axis=-1) > 1.0
                alpha = jnp.where(outer, alpha_nerf, 0.0)
                scolor = color_nerf

            escape = (b["active"] & ~b["hit"])[:, None]
            alpha = alpha.reshape(rn, n_s)
            weights = alpha_to_weights(alpha)
            if i == 1:
                # trainable inner segment: linear-space compositing, as the
                # reference does (renderer_zerothick.py:1948-1952)
                scolor = srgb_to_linear(scolor.reshape(rn, n_s, 3))
                seg_color = jnp.sum(scolor * weights[..., None], axis=1)
                if infinity_fill:
                    acc_seg = jnp.sum(weights, axis=-1, keepdims=True)
                    seg_color = seg_color + (1.0 - acc_seg) * escape
            elif cfg.get("bg_srgb_composite", True):
                # frozen background segments: composite in sRGB space —
                # stage-1's convention (stage1.render_core:434) — then add
                # the is_nerf white fill on escaped lanes, so an escaped
                # lane renders the frozen field EXACTLY as stage-1 did.
                scolor = scolor.reshape(rn, n_s, 3)
                seg_srgb = jnp.sum(scolor * weights[..., None], axis=1)
                if infinity_fill:
                    acc_seg = jnp.sum(weights, axis=-1, keepdims=True)
                    seg_srgb = seg_srgb + (1.0 - acc_seg) * escape
                seg_color = srgb_to_linear(seg_srgb)
            else:
                # reference-parity mode: linear-space compositing of the
                # background segments (renderer_zerothick.py:1948-1952)
                scolor = srgb_to_linear(scolor.reshape(rn, n_s, 3))
                seg_color = jnp.sum(scolor * weights[..., None], axis=1)
                if infinity_fill:
                    acc_seg = jnp.sum(weights, axis=-1, keepdims=True)
                    seg_color = seg_color + (1.0 - acc_seg) * escape
            seg_T = jnp.prod(1.0 - alpha + 1e-7, axis=-1, keepdims=True)
            # an escaped lane's radiance is fully accounted (fill): nothing
            # behind it may leak through
            if infinity_fill:
                seg_T = jnp.where(escape, 0.0, seg_T)

            act = b["active"][:, None]
            total_color = total_color + seg_color * current_T * act
            current_T = jnp.where(act, current_T * seg_T, current_T)

            # interface shading on converged lanes (:1930-1948)
            iface_pts = b["pos"]
            feats1 = self._stage1_sdf_feats(params, iface_pts)
            if i == 0 and not is_train:
                c_if, occ_if, inter_if = self.stage1.color_net.apply(
                    frozen["shade"], iface_pts, b["normal"], -b["dir"], feats1,
                    None, inter_results=True)
                # reference overrides with S2 composition; reuse s2_shade for
                # the actual color and take channels from the full forward
                normals_out = jnp.where(b["conv"][:, None],
                                        (normalize(b["normal"]) + 1) * 0.5, 0.0)
                spec_color_out = jnp.where(b["conv"][:, None],
                                           inter_if["specular_color"], 0.0)
                spec_light_out = jnp.where(b["conv"][:, None],
                                           inter_if["specular_light"], 0.0)
                spec_ref_out = jnp.where(b["conv"][:, None],
                                         inter_if["specular_ref"], 0.0)
            c_if, occ_if = self.stage1.color_net.apply(
                frozen["shade"], iface_pts, b["normal"], -b["dir"], feats1,
                self._is_internal(i), method=AppShadingNetwork.s2_shade)
            c_if_lin = srgb_to_linear(c_if)
            conv = b["conv"][:, None]
            total_color = total_color + c_if_lin * current_T * conv
            current_T = jnp.where(conv,
                                  current_T * occ_if["refraction_coefficient"],
                                  current_T)
            # Beer-Lambert absorption over the glass chord crossed at this
            # interface (shell mode records it in the bounce; the reference
            # models no absorption).  The chord length is thickness-driven
            # (see _shell_cross), so per-channel rim tint becomes a direct
            # optical-path-length cue for the thickness/IoR fields instead
            # of veil fodder for the light fields (round-4 verdict item 3).
            if "chord" in b and self.cfg.get("learn_absorption", False):
                # freeze gate (round-5 finding, runs shell_s2 r5a): while the
                # inner NeuS is soft its fog paints the rim tint with more
                # dof than 3-channel kappa, and kappa decays 0.127 -> 0.01
                # before the hardening floor kills the fog.  Hold kappa at
                # its init until the surface hardens (same cure as
                # IoR/thickness, see _freeze_flag).
                frozen_kap = self._freeze_flag(
                    params["train"], step, "freeze_absorption_step",
                    "freeze_absorption_inv_s")
                raw = self._maybe_freeze(params["train"]["absorption"],
                                         frozen_kap)
                kappa = jax.nn.softplus(raw)
                att = jnp.exp(-kappa[None, :] * b["chord"])
                current_T = jnp.where(conv, current_T * att, current_T)

        ray_rgb = jnp.clip(linear_to_srgb(total_color), 0.0, 1.0)
        # training observability: mean glass IoR at the entry interface
        # (zero-thick map 1/(x+1) => n_glass = x+1, renderer_zerothick.py:1642;
        # shell map 1/(x+0.6), renderer.py:1727) and whether the freeze gate
        # held this step — the round-3 failure mode (IoR drift while NeuS was
        # soft) was invisible in the train log
        b0 = bounces[0]
        hitf = b0["hit"].astype(jnp.float32)
        ior_off = self.cfg.get("ior_offset", 1.0)
        ior_glass = jax.lax.stop_gradient(
            jnp.sum((b0["ior_raw"][..., 0] + ior_off) * hitf)
            / (jnp.sum(hitf) + 1e-8))
        if "thickness" in b0:  # shell mode: mean learned shell thickness
            outputs["thickness_mean"] = jax.lax.stop_gradient(
                jnp.sum(b0["thickness"][..., 0] * hitf)
                / (jnp.sum(hitf) + 1e-8))
            outputs["thickness_frozen"] = b0["thickness_frozen"]
        if self.cfg.get("learn_absorption", False):
            kappa_log = jax.lax.stop_gradient(
                jax.nn.softplus(params["train"]["absorption"]))
            outputs["kappa_r"] = kappa_log[0]
            outputs["kappa_g"] = kappa_log[1]
            outputs["kappa_b"] = kappa_log[2]
        outputs.update({
            "ray_rgb": ray_rgb,
            "gradient_error": grad_err,
            "std": std_out,
            "ior_glass": ior_glass,
            "ior_frozen": b0["ior_frozen"],
            "acc": jnp.ones((rn,)),
            "tir_mask": jax.lax.stop_gradient(tir_mask[:, None].astype(jnp.float32)),
            "normal": normals_out,
            "specular_color": spec_color_out,
            "specular_light": spec_light_out,
            "specular_ref": spec_ref_out,
        })
        return outputs

    # ----- trainer entry points -----------------------------------------
    def get_anneal_val(self, step):
        if self.cfg["anneal_end"] < 0:
            return jnp.asarray(1.0)
        return jnp.minimum(1.0, step / self.cfg["anneal_end"])

    def compute_rgb_loss(self, rgb_pr, rgb_gt):
        mode = self.cfg["rgb_loss"]
        if mode == "l2":
            return jnp.sum((rgb_pr - rgb_gt) ** 2, -1)
        if mode == "l1":
            return jnp.sum(jnp.abs(rgb_pr - rgb_gt), -1)
        if mode == "charbonier":
            return jnp.sqrt(jnp.sum((rgb_gt - rgb_pr) ** 2, axis=-1) + 0.001)
        raise NotImplementedError(mode)

    def train_outputs(self, params, batch, rng, step):
        outputs = self.render(params, batch["rays_o"], normalize(batch["rays_d"]),
                              rng, step,
                              cos_anneal_ratio=self.get_anneal_val(step),
                              is_train=True)
        tm = outputs["tir_mask"]
        outputs["loss_rgb"] = self.compute_rgb_loss(
            outputs["ray_rgb"] * tm, batch["rgbs"] * tm)
        return outputs

    def test_outputs(self, params, batch, rng, step):
        outputs = self.render(params, batch["rays_o"], normalize(batch["rays_d"]),
                              rng, step, cos_anneal_ratio=1.0, is_train=False,
                              with_inter=True)
        tm = outputs["tir_mask"]
        outputs["loss_rgb"] = self.compute_rgb_loss(
            outputs["ray_rgb"] * tm, batch["rgbs"] * tm)
        return outputs
