from nunerf_tpu.utils.profiling import profile_trace, StepTimer
from nunerf_tpu.utils.debug import check_finite_tree
