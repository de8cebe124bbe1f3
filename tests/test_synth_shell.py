"""Analytic hollow-glass (thick shell) scene: tracer invariants that the
shell-mode stage-2 validation relies on."""

import numpy as np

from nunerf_tpu.tools.synth_nested import (
    IOR,
    R_OUTER,
    SHELL_TAU,
    env_color,
    trace_rays,
    trace_rays_hollow,
)


def _ray_batch(n=4096, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3))
    o = 2.2 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / 2.2 + 0.25 * rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_hollow_energy_and_range():
    o, d = _ray_batch()
    rgb, hit = trace_rays_hollow(o, d)
    assert np.isfinite(rgb).all()
    assert (rgb >= 0).all() and (rgb <= 1).all()
    assert 0.2 < hit.mean() < 0.6


def test_hollow_miss_is_env():
    o = np.array([[0.0, 0.0, 2.0]])
    d = np.array([[0.0, 0.0, 1.0]])  # points away from the sphere
    rgb, hit = trace_rays_hollow(o, d)
    assert not hit[0]
    np.testing.assert_allclose(rgb[0], np.clip(env_color(d)[0], 0, 1),
                               rtol=1e-6)


def test_hollow_differs_from_solid():
    """The air core bends rays far less than solid glass — if the two
    tracers agree, the shell scene carries no thickness signal at all."""
    o, d = _ray_batch()
    rgb_h, hit = trace_rays_hollow(o, d)
    rgb_s, _ = trace_rays(o, d)
    assert np.abs(rgb_h - rgb_s)[hit].mean() > 0.05


def test_hollow_center_ray_sees_inner_object():
    """A paraxial ray passes both interfaces nearly undeviated and must land
    on the red inner sphere (center offset 0.02, radius 0.24)."""
    o = np.array([[2.0, 0.0, -0.1]])
    d = np.array([[-1.0, 0.0, 0.0]])
    rgb, hit = trace_rays_hollow(o, d)
    assert hit[0]
    # lambertian red-ish: red channel dominates
    assert rgb[0, 0] > rgb[0, 2] + 0.1


def test_hollow_grazing_chord():
    """Rays grazing the limb refract through the shell without entering the
    air core (the chord branch) and still return finite colors."""
    # impact parameter just inside R_OUTER
    b = R_OUTER - 0.25 * SHELL_TAU
    o = np.array([[2.0, b, 0.0]])
    d = np.array([[-1.0, 0.0, 0.0]])
    rgb, hit = trace_rays_hollow(o, d)
    assert hit[0]
    assert np.isfinite(rgb).all()


def test_shell_scene_meta(tmp_path):
    import json
    from nunerf_tpu.tools.synth_nested import make_nested_scene
    root = make_nested_scene(str(tmp_path / "s"), n_train=2, n_test=1,
                             h=16, w=16, shell=True)
    meta = json.load(open(f"{root}/meta.json"))
    assert meta["mode"] == "shell"
    assert meta["tau"] == SHELL_TAU and meta["ior"] == IOR
