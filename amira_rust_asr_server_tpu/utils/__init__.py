"""Cross-cutting utilities: platform probe, async patterns."""

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
]
