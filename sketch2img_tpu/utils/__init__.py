from sketch2img_tpu.utils.profiling import trace, device_timeit
from sketch2img_tpu.utils.debug import enable_nan_checks, assert_tree_finite

__all__ = ["trace", "device_timeit", "enable_nan_checks", "assert_tree_finite"]
