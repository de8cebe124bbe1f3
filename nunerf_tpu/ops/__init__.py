from nunerf_tpu.ops.embedder import posenc, posenc_dim
from nunerf_tpu.ops.srgb import linear_to_srgb, srgb_to_linear
from nunerf_tpu.ops.ide import make_ide_fn, ipe
from nunerf_tpu.ops.geometry import (
    reflect,
    refract,
    fresnel_dielectric,
    get_sphere_intersection,
    offset_points_to_sphere,
    near_far_from_sphere,
)
from nunerf_tpu.ops.sampling import sample_pdf
from nunerf_tpu.ops.volume import alpha_to_weights, composite
