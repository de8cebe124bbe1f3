from nunerf_tpu.fields.mlp import WNDense, Predictor
from nunerf_tpu.fields.sdf import SDFNetwork
from nunerf_tpu.fields.nerf import NeRFNetwork
from nunerf_tpu.fields.variance import SingleVarianceNetwork
from nunerf_tpu.fields.shading import AppShadingNetwork
from nunerf_tpu.fields.aux import InfOutNetwork, IoRNetwork, ThicknessNetwork, MaterialFeatsNetwork
