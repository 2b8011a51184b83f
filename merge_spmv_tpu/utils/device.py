"""Device introspection and the peak-bandwidth probe.

TPU analog of CommandLineArgs::DeviceInit (utils.h:451-515): the reference
computes GPU peak GB/s from bus width × memory clock; TPUs do not expose
those registers, so we carry a table of published per-chip HBM bandwidths and
report "% of peak" against it (the denominator of the roofline audit).
"""

from __future__ import annotations

__all__ = ["peak_hbm_bandwidth", "device_info", "PEAK_HBM_GBPS"]

# Published peak HBM bandwidth per chip, GB/s.
PEAK_HBM_GBPS = {
    "v2": 700.0,
    "v3": 900.0,
    "v4": 1228.0,
    "v5 lite": 819.0,   # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,  # Trillium
    "v6e": 1640.0,
    "cpu": 50.0,        # nominal, for interpret-mode smoke runs
}

# Published peak dense compute per chip (for roofline context), GFLOP/s.
PEAK_FLOPS_GFLOPS = {
    ("v5e", "bfloat16"): 394_000.0,
    ("v5e", "float32"): 98_500.0,
    ("v5p", "bfloat16"): 459_000.0,
    ("v5p", "float32"): 114_750.0,
    ("v6e", "bfloat16"): 918_000.0,
}


def _kind_key(device_kind: str) -> str:
    k = device_kind.lower()
    for name in PEAK_HBM_GBPS:
        if name in k:
            return name
    return "cpu" if "cpu" in k or "host" in k else k


def peak_hbm_bandwidth(device=None) -> float:
    """Peak HBM GB/s for `device` (default: first jax device)."""
    import jax
    if device is None:
        device = jax.devices()[0]
    return PEAK_HBM_GBPS.get(_kind_key(device.device_kind), 819.0)


def device_info(device=None) -> dict:
    """Summary dict: platform, kind, peak bandwidth, memory stats if exposed."""
    import jax
    if device is None:
        device = jax.devices()[0]
    info = {
        "platform": device.platform,
        "device_kind": device.device_kind,
        "id": device.id,
        "process_index": device.process_index,
        "num_devices": jax.device_count(),
        "num_processes": jax.process_count(),
        "peak_hbm_gbps": peak_hbm_bandwidth(device),
    }
    try:
        mem = device.memory_stats()
        if mem:
            info["bytes_limit"] = mem.get("bytes_limit")
            info["bytes_in_use"] = mem.get("bytes_in_use")
    except Exception:
        pass
    return info
