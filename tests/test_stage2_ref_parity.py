"""Stage-2 (zero-thickness) render parity against the reference's OWN
Stage2Renderer (renderer_zerothick.py:868-2060), imported and run on CPU.

The mesh/OptiX stack is replaced on BOTH sides by the same analytic glass
sphere (radius 0.5, exact differentiable intersection + outward normals), so
the comparison isolates everything the stage-2 math does: the 3-bounce Snell
chain with TIR masks and per-point IoR (ray_trace), per-segment sampling
(uniform-to-hit / NeuS-upsampled interior / importance-sampled background),
frozen-stage-1 field evaluation, interface shading through the S2 heads, and
linear-space transmittance chaining (render_core).

Parity cfg on our side: bg_sampling='linear64', bg_infinity_fill=False,
bg_srgb_composite=False, inner_upsample_parity_quirk=True — the reference's
exact laws (including its fraction/world unit mix-up in the inner upsample).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from ref_import import (CudaToCpu, load_reference_renderer, predictor_to_jax,
                        randomize_wn, reference_cwd)
from ref_import import wn_to_jax as ref_wn_to_jax

R_SPHERE = 0.5


# ---------------------------------------------------------------------------
# analytic glass sphere standing in for the mesh + intersector on both sides

def _sphere_t(o, d, xp):
    b = (o * d).sum(-1)
    c = (o * o).sum(-1) - R_SPHERE * R_SPHERE
    disc = b * b - c
    sq = xp.sqrt(xp.clip(disc, 0.0, None) if xp is np else disc.clamp(min=0.0))
    t0, t1 = -b - sq, -b + sq
    t = xp.where(t0 > 1e-5, t0, t1)
    hit = (disc > 0) & (t > 1e-5)
    return t, hit


class FakeSceneTorch:
    """Drop-in for DiffRender.Scene: analytic sphere Dintersect."""

    def __init__(self, mesh_path=None):
        pass

    def Dintersect(self, ray):
        import network.DiffRender as DR
        o, d = ray.origin, ray.direction
        b = (o * d).sum(-1)
        c = (o * o).sum(-1) - R_SPHERE * R_SPHERE
        disc = b * b - c
        sq = torch.sqrt(disc.clamp(min=0.0))
        t0, t1 = -b - sq, -b + sq
        t = torch.where(t0 > 1e-5, t0, t1)
        hitted = (disc > 0) & (t > 1e-5)
        ray_h = ray.select(hitted)
        t_h = t[hitted]
        p = ray_h.origin + t_h[:, None] * ray_h.direction
        n = p / torch.linalg.norm(p, dim=-1, keepdim=True)
        g_k = torch.full_like(t_h[:, None], 1.0 / (R_SPHERE * R_SPHERE))
        inter = DR.Intersection(u=t_h * 0, v=t_h * 0, t=t_h, n=n, g_k=g_k,
                                ray=ray_h,
                                faces_ind=torch.zeros_like(t_h).long())
        return inter, hitted


class FakeSceneJax:
    """Drop-in for tracing.Scene.dintersect on our side (same sphere)."""

    def dintersect(self, rays_o, rays_d):
        t, hit = _sphere_t(np.asarray(rays_o) * 1.0, np.asarray(rays_d), np)
        # differentiable t via jnp (matches the torch fake's autograd path)
        b = jnp.sum(rays_o * rays_d, -1)
        c = jnp.sum(rays_o * rays_o, -1) - R_SPHERE * R_SPHERE
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        tj = jnp.where(t0 > 1e-5, t0, t1)
        hitj = (disc > 0) & (tj > 1e-5)
        t_safe = jnp.where(hitj, tj, 1.0)
        pos = rays_o + t_safe[:, None] * rays_d
        normal = pos / jnp.maximum(
            jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
        return {
            "pos": jnp.where(hitj[:, None], pos, rays_o),
            "normal": jnp.where(hitj[:, None], normal,
                                jnp.array([0.0, 0.0, 1.0])),
            "geo_normal": normal,
            "curvature": jnp.full((rays_o.shape[0], 1),
                                  1.0 / (R_SPHERE * R_SPHERE)),
            "t": t_safe[:, None],
            "hit": hitj,
        }


S1_CFG = {"is_nerf": True, "apply_occ_loss": False, "get_mask": False,
          "shader_config": {"sphere_direction": False}}


def _lin2jax(lin):
    return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def _shading2jax(tshade):
    mapping = {
        "metallic": tshade.metallic_predictor,
        "roughness": tshade.roughness_predictor,
        "albedo": tshade.albedo_predictor,
        "outer_light": tshade.outer_light,
        "inner_light": tshade.inner_light,
        "inner_weight": tshade.inner_weight,
        "transmission_weight": tshade.transmisstion_weight,
        "refrac_light": tshade.refrac_light,
    }
    return {"params": {k: predictor_to_jax(v) for k, v in mapping.items()}}


def _transfer_stage1(s1_torch, s1_ours):
    """All stage-1 weights the stage-2 render path touches -> our pytree."""
    frozen = {}
    frozen["sdf"] = {"params": {
        f"lin{l}": ref_wn_to_jax(getattr(s1_torch.sdf_network, f"lin{l}"))
        for l in range(9)}}
    frozen["var"] = {"params": {"variance": jnp.asarray(
        s1_torch.deviation_network.variance.detach().numpy().reshape(()))}}
    new = {f"pts_{i}": _lin2jax(l)
           for i, l in enumerate(s1_torch.outer_nerf.pts_linears)}
    new["alpha"] = _lin2jax(s1_torch.outer_nerf.alpha_linear)
    new["feature"] = _lin2jax(s1_torch.outer_nerf.feature_linear)
    new["views_0"] = _lin2jax(s1_torch.outer_nerf.views_linears[0])
    new["rgb"] = _lin2jax(s1_torch.outer_nerf.rgb_linear)
    frozen["nerf"] = {"params": new}
    frozen["shade"] = _shading2jax(s1_torch.color_network)
    frozen["inf_out"] = s1_ours.inf_out.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)))  # unused by both
    return frozen


@pytest.fixture(scope="module")
def stage2_pair(tmp_path_factory):
    """(reference Stage2Renderer, our Stage2Renderer, our params)."""
    from nunerf_tpu.models.stage2 import Stage2Renderer

    ref_rz = load_reference_renderer()
    tmp = tmp_path_factory.mktemp("s2parity")

    # fabricate the stage-1 checkpoint + cfg the reference loads at init
    torch.manual_seed(23)
    with CudaToCpu(), reference_cwd():
        t_s1 = ref_rz.name2renderer["shape"](S1_CFG, training=False)
    randomize_wn(t_s1)
    ckpt = str(tmp / "s1.pth")
    torch.save({"network_state_dict": t_s1.state_dict()}, ckpt)
    import yaml
    s1_cfg_path = str(tmp / "s1.yaml")
    with open(s1_cfg_path, "w") as f:
        yaml.safe_dump(S1_CFG, f)

    cfg2 = {"is_nerf": True, "apply_occ_loss": False,
            "shader_config": {"sphere_direction": False},
            "stage1_ckpt_dir": ckpt, "stage1_cfg_dir": s1_cfg_path,
            "stage1_mesh_dir": "unused.ply"}
    old_scene = ref_rz.Scene
    ref_rz.Scene = FakeSceneTorch
    try:
        torch.manual_seed(29)
        with CudaToCpu(), reference_cwd():
            tref = ref_rz.name2renderer["stage2"](cfg2, training=False)
    finally:
        ref_rz.Scene = old_scene
    randomize_wn(tref)

    ours = Stage2Renderer(
        {"is_nerf": True,
         "shader_config": {"sphere_direction": False},
         "stage1_cfg": S1_CFG,
         "bg_sampling": "linear64", "bg_infinity_fill": False,
         "bg_srgb_composite": False, "inner_upsample_parity_quirk": True,
         "n_samples_outer": 256, "n_bg_importance": 64,
         "n_samples_inner": 64, "inner_up_rounds": 2, "inner_up_each": 32,
         "seg_far": 4.5,
         "mixed_precision": False, "sdf_mixed_precision": False,
         "fused_sdf": False},
        scene=FakeSceneJax(),
        stage1_params={"placeholder": True})

    # ---- frozen stage-1 transfer (from tref.stage1_network, which
    # randomize_wn(tref) re-randomized) ----
    s1 = tref.stage1_network
    frozen = {}
    frozen["sdf"] = {"params": {
        f"lin{l}": ref_wn_to_jax(getattr(s1.sdf_network, f"lin{l}"))
        for l in range(9)}}
    frozen["var"] = {"params": {"variance": jnp.asarray(
        s1.deviation_network.variance.detach().numpy().reshape(()))}}

    def lin2jax(lin):
        return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
                "bias": jnp.asarray(lin.bias.detach().numpy())}

    def nerf2jax(tnerf):
        new = {f"pts_{i}": lin2jax(l)
               for i, l in enumerate(tnerf.pts_linears)}
        new["alpha"] = lin2jax(tnerf.alpha_linear)
        new["feature"] = lin2jax(tnerf.feature_linear)
        new["views_0"] = lin2jax(tnerf.views_linears[0])
        new["rgb"] = lin2jax(tnerf.rgb_linear)
        return {"params": new}

    frozen["nerf"] = nerf2jax(s1.outer_nerf)

    def shading2jax(tshade):
        mapping = {
            "metallic": tshade.metallic_predictor,
            "roughness": tshade.roughness_predictor,
            "albedo": tshade.albedo_predictor,
            "outer_light": tshade.outer_light,
            "inner_light": tshade.inner_light,
            "inner_weight": tshade.inner_weight,
            "transmission_weight": tshade.transmisstion_weight,
            "refrac_light": tshade.refrac_light,
        }
        return {"params": {k: predictor_to_jax(v) for k, v in mapping.items()}}

    frozen["shade"] = shading2jax(s1.color_network)
    frozen["inf_out"] = ours.stage1.inf_out.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)))  # unused by both

    # ---- trainable transfer ----
    def wnstack2jax(seq):
        lins = [m for m in seq if isinstance(m, torch.nn.Linear)]
        return {"params": {"module0": {
            f"layer_{i}": ref_wn_to_jax(l) for i, l in enumerate(lins)}}}

    train = {
        "sdf_inner": {"params": {
            f"lin{l}": ref_wn_to_jax(getattr(tref.sdf_network_inner,
                                             f"lin{l}"))
            for l in range(9)}},
        "var_inner": {"params": {"variance": jnp.asarray(
            tref.deviation_network_inner.variance.detach().numpy()
            .reshape(()))}},
        "shade_inner": shading2jax(tref.color_network_inner),
        "ior": wnstack2jax(tref.IORs_pred.module0),
        "ior_int": wnstack2jax(tref.IoRint_pred.module0),
        "thickness": wnstack2jax(tref.thickness_pred.module0),
        "iors_vec": jnp.asarray(tref.IORs.detach().numpy()),
    }
    ours.stage1_params = frozen
    params = {"train": train, "frozen": frozen}
    return tref, ours, params


def _rays(n=20):
    rs = np.random.RandomState(9)
    o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n, 1))
    tgt = rs.randn(n, 3).astype(np.float32) * 0.35
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.slow
def test_stage2_ray_trace_parity(stage2_pair):
    """Bounce chain parity: per-bounce interface points, refracted
    directions and the combined TIR mask."""
    tref, ours, params = stage2_pair
    o, d = _rays()
    with torch.no_grad(), CudaToCpu(), reference_cwd():
        (pathes, converges, directions, ior_ratios, infinity_bkgr,
         gradient_mesh, tir0) = tref.ray_trace(torch.from_numpy(o),
                                               torch.from_numpy(d))
    bounces, tir_mask = ours.ray_trace(params, jnp.asarray(o),
                                       jnp.asarray(d))

    # reconstruct the reference's per-original-ray convergence chain
    conv0 = converges[0].numpy().reshape(-1)
    assert conv0.sum() >= 10, "parity rays barely hit the glass — vacuous"
    np.testing.assert_array_equal(np.asarray(bounces[0]["conv"]), conv0)
    np.testing.assert_array_equal(np.asarray(tir_mask),
                                  tir0.numpy().reshape(-1))

    # bounce-1 dir: reference arrays are compacted to converged lanes
    ours_dir1 = np.asarray(bounces[1]["dir"])[conv0]
    np.testing.assert_allclose(ours_dir1, directions[1].numpy(), atol=1e-5)
    if len(directions) > 2:
        conv1_full = np.zeros_like(conv0)
        conv1_full[conv0] = converges[1].numpy().reshape(-1)
        ours_dir2 = np.asarray(bounces[2]["dir"])[conv1_full]
        np.testing.assert_allclose(ours_dir2, directions[2].numpy(),
                                   atol=1e-5)


@pytest.mark.slow
def test_stage2_render_parity(stage2_pair):
    """Full stage-2 rendered-pixel parity: same weights, same rays, same
    analytic glass sphere -> allclose ray_rgb (linear chaining, frozen
    background, S2 interface shading, NeuS interior)."""
    tref, ours, params = stage2_pair
    o, d = _rays()
    n = o.shape[0]
    with torch.no_grad(), CudaToCpu(), reference_cwd():
        ref_out = tref.render(torch.from_numpy(o), torch.from_numpy(d),
                              None, None, torch.zeros(n, 3, 4),
                              perturb_overwrite=0, cos_anneal_ratio=1.0,
                              is_train=True, step=30000, is_nerf=True)
    out = ours.render(params, jnp.asarray(o), jnp.asarray(d),
                      jax.random.PRNGKey(0), jnp.asarray(30000, jnp.int32),
                      cos_anneal_ratio=1.0, is_train=True)

    ref_rgb = ref_out["ray_rgb"].numpy()
    ref_tir = ref_out["tir_mask"].numpy().reshape(-1, 1)
    ours_rgb = np.asarray(out["ray_rgb"])
    ours_tir = np.asarray(out["tir_mask"])
    np.testing.assert_array_equal(ours_tir, ref_tir)
    # 5e-3: the stage-1 shader's 2e-3 IDE bound, traversed twice (entry +
    # exit interface) and composited through the transmittance chain
    np.testing.assert_allclose(ours_rgb * ours_tir, ref_rgb * ref_tir,
                               atol=5e-3)


@pytest.fixture(scope="module")
def shell_pair(tmp_path_factory):
    """Reference curvature-shell Stage2Renderer (network/renderer.py) vs our
    Stage2ShellRenderer on the same analytic sphere (curvature 1/r^2)."""
    from ref_import import load_reference_renderer_shell
    from nunerf_tpu.models.stage2_shell import Stage2ShellRenderer

    ref_r = load_reference_renderer_shell()
    tmp = tmp_path_factory.mktemp("shellparity")

    torch.manual_seed(31)
    with CudaToCpu(), reference_cwd():
        t_s1 = ref_r.name2renderer["shape"](S1_CFG, training=False)
    randomize_wn(t_s1)
    ckpt = str(tmp / "s1.pth")
    torch.save({"network_state_dict": t_s1.state_dict()}, ckpt)
    import yaml
    s1_cfg_path = str(tmp / "s1.yaml")
    with open(s1_cfg_path, "w") as f:
        yaml.safe_dump(S1_CFG, f)

    cfg2 = {"is_nerf": True, "apply_occ_loss": False, "get_mask": False,
            "shader_config": {"sphere_direction": False},
            "stage1_ckpt_dir": ckpt, "stage1_cfg_dir": s1_cfg_path,
            "stage1_mesh_dir": "unused.ply"}
    old_scene = ref_r.Scene
    ref_r.Scene = FakeSceneTorch
    try:
        torch.manual_seed(37)
        with CudaToCpu(), reference_cwd():
            tref = ref_r.name2renderer["stage2"](cfg2, training=False)
    finally:
        ref_r.Scene = old_scene
    randomize_wn(tref)

    from nunerf_tpu.models.stage2_shell import Stage2ShellRenderer
    ours = Stage2ShellRenderer(
        {"is_nerf": True,
         "shader_config": {"sphere_direction": False},
         "stage1_cfg": S1_CFG,
         "bg_sampling": "inverse", "bg_infinity_fill": False,
         "bg_srgb_composite": False, "inner_upsample_parity_quirk": True,
         "mixed_precision": False, "sdf_mixed_precision": False,
         "fused_sdf": False},
        scene=FakeSceneJax(),
        stage1_params={"placeholder": True})

    def wnstack2jax(seq):
        lins = [m for m in seq if isinstance(m, torch.nn.Linear)]
        return {"params": {"module0": {
            f"layer_{i}": ref_wn_to_jax(l) for i, l in enumerate(lins)}}}

    frozen = _transfer_stage1(tref.stage1_network, ours.stage1)
    train = {
        "sdf_inner": {"params": {
            f"lin{l}": ref_wn_to_jax(getattr(tref.sdf_network_inner,
                                             f"lin{l}"))
            for l in range(9)}},
        "var_inner": {"params": {"variance": jnp.asarray(
            tref.deviation_network_inner.variance.detach().numpy()
            .reshape(()))}},
        "shade_inner": _shading2jax(tref.color_network_inner),
        "ior": wnstack2jax(tref.IORs_pred.module0),
        "ior_int": wnstack2jax(tref.IoRint_pred.module0),
        "thickness": wnstack2jax(tref.thickness_pred.module0),
        "iors_vec": jnp.asarray(tref.IORs.detach().numpy()),
    }
    ours.stage1_params = frozen
    return tref, ours, {"train": train, "frozen": frozen}


@pytest.mark.slow
def test_shell_ray_trace_parity(shell_pair):
    """Curvature-shell bounce-chain parity: entry shell crossing (two Snell
    refractions + osculating-sphere chord), exit pull-back to the inner
    shell, TIR chain — our _shell_cross vs renderer.py:1610-2009."""
    tref, ours, params = shell_pair
    o, d = _rays(24)
    with torch.no_grad(), CudaToCpu(), reference_cwd():
        (pathes, converges, directions, ior_ratios, infinity_bkgr,
         gradient_mesh, tir0) = tref.ray_trace(
            torch.from_numpy(o), torch.from_numpy(d),
            torch.ones(o.shape[0], 1))
    bounces, tir_mask = ours.ray_trace(params, jnp.asarray(o),
                                       jnp.asarray(d))

    conv0 = converges[0].numpy().reshape(-1)
    assert conv0.sum() >= 10, "parity rays barely hit the glass — vacuous"
    np.testing.assert_array_equal(np.asarray(bounces[0]["conv"]), conv0)
    np.testing.assert_array_equal(np.asarray(tir_mask),
                                  tir0.numpy().reshape(-1))

    # bounce-1 (inside the core after the entry shell crossing).
    # 5e-4: the reference normalizes by (norm + 1e-4) — its directions are
    # systematically ~1e-4 short of unit length; our shell path normalizes
    # exactly (models/stage2_shell.py), so a ~1e-4 scale offset remains.
    ours_dir1 = np.asarray(bounces[1]["dir"])[conv0]
    np.testing.assert_allclose(ours_dir1, directions[1].numpy(), atol=5e-4)

    if len(directions) > 2:
        conv1_c = converges[1].numpy().reshape(-1)  # over conv0 lanes
        conv1_full = np.zeros_like(conv0)
        conv1_full[conv0] = conv1_c
        np.testing.assert_array_equal(
            np.asarray(bounces[1]["conv"]), conv1_full)
        ours_dir2 = np.asarray(bounces[2]["dir"])[conv1_full]
        np.testing.assert_allclose(ours_dir2, directions[2].numpy(),
                                   atol=5e-4)


@pytest.mark.slow
def test_shell_render_parity(shell_pair):
    """Full curvature-shell rendered-pixel parity: shell ray trace +
    per-segment sampling (uniform-to-hit / NeuS interior / inverse-depth
    background) + SpecInner interior shading + S2 interface shading +
    transmittance chaining, vs renderer.py:1482-2353."""
    tref, ours, params = shell_pair
    o, d = _rays(20)
    n = o.shape[0]
    with torch.no_grad(), CudaToCpu(), reference_cwd():
        ref_out = tref.render(torch.from_numpy(o), torch.from_numpy(d),
                              torch.ones(n, 1), None, None,
                              torch.zeros(n, 3, 4),
                              perturb_overwrite=0, cos_anneal_ratio=1.0,
                              is_train=True, step=30000, is_nerf=True)
    out = ours.render(params, jnp.asarray(o), jnp.asarray(d),
                      jax.random.PRNGKey(0), jnp.asarray(30000, jnp.int32),
                      cos_anneal_ratio=1.0, is_train=True)

    ref_rgb = ref_out["ray_rgb"].numpy()
    ref_tir = ref_out["tir_mask"].numpy().reshape(-1, 1)
    ours_rgb = np.asarray(out["ray_rgb"])
    ours_tir = np.asarray(out["tir_mask"])
    np.testing.assert_array_equal(ours_tir, ref_tir)
    # 8e-3: the zero-thickness bound (5e-3) plus the shell chain's extra
    # interface and the reference's (norm+1e-4) direction slack feeding the
    # sample positions
    np.testing.assert_allclose(ours_rgb * ours_tir, ref_rgb * ref_tir,
                               atol=8e-3)
