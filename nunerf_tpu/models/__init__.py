from nunerf_tpu.models.stage1 import ShapeRenderer
from nunerf_tpu.models.stage2 import Stage2Renderer
from nunerf_tpu.models.stage2_shell import Stage2ShellRenderer


def build_renderer(cfg, **kwargs):
    """Reference dispatch: ``name2renderer`` (renderer.py:2400-2403) +
    thickness-mode selection (run_training.py:16-20)."""
    network = cfg.get("network", "shape")
    if network == "shape":
        return ShapeRenderer(cfg)
    if network == "stage2":
        if cfg.get("zero_thickness", False):
            return Stage2Renderer(cfg, **kwargs)
        return Stage2ShellRenderer(cfg, **kwargs)
    raise NotImplementedError(network)


name2renderer = {
    "shape": ShapeRenderer,
    "stage2": Stage2Renderer,
}
