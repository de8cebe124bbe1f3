from nunerf_tpu.tracing.mesh_ops import (
    extract_geometry,
    load_ply,
    save_ply,
    vertex_normals_curvature,
    isotropic_remesh,
)
from nunerf_tpu.tracing.scene import Scene
