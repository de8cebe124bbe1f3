from nunerf_tpu.models.stage1 import ShapeRenderer
