from nunerf_tpu.train.loss import compute_losses, name2loss_terms
from nunerf_tpu.train.lr import warm_up_cos_schedule
