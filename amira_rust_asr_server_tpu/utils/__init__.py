"""Cross-cutting utilities: platform probe, async patterns."""

from .affinity import (AffinityPlan, CpuTopology, ThreadType,
                       make_initializer, recommended_allocation_size,
                       set_thread_affinity)
from .async_patterns import (AsyncTaskManager, ErrorRecoveryManager,
                             PerformanceMonitor, Timer)
from .platform import (CloudInfo, DeviceTopology, HostInfo, PlatformInit,
                       detect_cloud, detect_devices, detect_host,
                       initialize_platform)

__all__ = [
    "initialize_platform", "detect_host", "detect_devices", "detect_cloud",
    "PlatformInit", "HostInfo", "DeviceTopology", "CloudInfo",
    "ErrorRecoveryManager", "AsyncTaskManager", "PerformanceMonitor",
    "Timer",
    "AffinityPlan", "CpuTopology", "ThreadType", "make_initializer",
    "set_thread_affinity", "recommended_allocation_size",
]
