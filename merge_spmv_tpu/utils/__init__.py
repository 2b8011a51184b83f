"""Harness utilities: result comparison, timing, device introspection.

TPU-native equivalents of the reference harness (utils.h): the ULP
comparator (utils.h:672-808), CPU/GPU timers (utils.h:528-658) and the
device-init bandwidth probe (utils.h:451-515).
"""

from merge_spmv_tpu.utils.compare import compare_results, ulp_distance
from merge_spmv_tpu.utils.timers import Timer, adaptive_timing_iterations, time_device_fn
from merge_spmv_tpu.utils.device import device_info, peak_hbm_bandwidth

__all__ = [
    "compare_results",
    "ulp_distance",
    "Timer",
    "adaptive_timing_iterations",
    "time_device_fn",
    "device_info",
    "peak_hbm_bandwidth",
]
