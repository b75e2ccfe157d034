"""Platform detection and startup orchestration.

TPU-native analogue of the reference's platform runtime (ref:
src/platform/detection.rs, capabilities.rs, cloud_detection.rs,
init.rs): probe the host OS + accelerator topology, detect the cloud
environment from GCE metadata (zero-egress safe: short timeout, graceful
fallback), derive effective settings, and validate at startup.

The reference's NUMA/affinity machinery lives in utils/affinity.py
(topology probe, thread-type core partitioning, allocation alignment),
sized for the TPU feeder model: on a TPU VM the host's job is feeding
the chip, and XLA's runtime owns device placement; what matters is
chip/ICI topology (jax.devices) and process/mesh layout.
"""

from __future__ import annotations

import dataclasses
import os
import platform as _platform
from typing import Any, List, Optional

from ..config import Config
from ..reliability import get_logger

log = get_logger("asr.platform")


@dataclasses.dataclass
class HostInfo:
    """Host OS/arch probe (ref: platform/detection.rs:9-110)."""

    os: str
    kernel: str
    arch: str
    cpu_count: int
    memory_gb: float
    in_container: bool


@dataclasses.dataclass
class DeviceTopology:
    """Accelerator topology (ref analogue: CUDA device probe; here
    jax.devices + mesh geometry)."""

    platform: str               # tpu | cpu | ...
    n_devices: int
    device_kinds: List[str]
    n_processes: int
    process_index: int
    coords: Optional[List[Any]]  # per-device chip coords when exposed
    memory_per_device_gb: Optional[float]


@dataclasses.dataclass
class CloudInfo:
    """Cloud environment (ref: platform/cloud_detection.rs:15-522)."""

    provider: str               # gcp | aws | azure | none/unknown
    instance_type: Optional[str] = None
    zone: Optional[str] = None
    tpu_env: bool = False


@dataclasses.dataclass
class PlatformInit:
    host: HostInfo
    devices: DeviceTopology
    cloud: CloudInfo
    effective_config: Config


def detect_host() -> HostInfo:
    mem_gb = 0.0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    mem_gb = int(line.split()[1]) / 1024 / 1024
                    break
    except OSError:
        pass
    return HostInfo(
        os=_platform.system().lower(),
        kernel=_platform.release(),
        arch=_platform.machine(),
        cpu_count=os.cpu_count() or 1,
        memory_gb=round(mem_gb, 1),
        in_container=os.path.exists("/.dockerenv"),
    )


def detect_devices() -> DeviceTopology:
    import jax
    devs = jax.devices()
    coords = None
    if devs and hasattr(devs[0], "coords"):
        try:
            coords = [getattr(d, "coords", None) for d in devs]
        except Exception:  # noqa: BLE001
            coords = None
    mem = None
    try:
        stats = devs[0].memory_stats()
        if stats and "bytes_limit" in stats:
            mem = round(stats["bytes_limit"] / 1024 ** 3, 1)
    except Exception:  # noqa: BLE001
        pass
    return DeviceTopology(
        platform=devs[0].platform if devs else "none",
        n_devices=len(devs),
        device_kinds=sorted({d.device_kind for d in devs}),
        n_processes=jax.process_count(),
        process_index=jax.process_index(),
        coords=coords,
        memory_per_device_gb=mem,
    )


def detect_cloud(timeout_s: float = 0.3) -> CloudInfo:
    """GCE metadata probe with graceful fallback (the reference probes
    AWS/GCP/Azure HTTP endpoints; here env vars first — TPU VMs export
    them — then one short metadata attempt)."""
    if os.environ.get("TPU_WORKER_HOSTNAMES") or \
            os.environ.get("TPU_SKIP_MDS_QUERY"):
        return CloudInfo(provider="gcp", tpu_env=True)
    try:
        import urllib.request
        req = urllib.request.Request(
            "http://metadata.google.internal/computeMetadata/v1/instance/"
            "machine-type", headers={"Metadata-Flavor": "Google"})
        body = urllib.request.urlopen(req, timeout=timeout_s).read().decode()
        return CloudInfo(provider="gcp", instance_type=body.rsplit("/", 1)[-1])
    except Exception:  # noqa: BLE001 — zero-egress or non-GCP
        return CloudInfo(provider="unknown")


def initialize_platform(config: Optional[Config] = None) -> PlatformInit:
    """Startup orchestration (ref: platform/init.rs:28-536): probe, adjust,
    validate, log one structured summary."""
    cfg = config or Config()
    host = detect_host()
    devices = detect_devices()
    cloud = detect_cloud()

    # derived adjustments (ref: cloud config mutation, init.rs:79-96)
    if devices.platform == "cpu" and cfg.inference_backend == "tpu":
        log.warning("no TPU visible; forcing inference_backend=cpu")
        cfg = dataclasses.replace(cfg, inference_backend="cpu")
    if not cfg.mesh_shape and devices.n_devices > 1:
        cfg = dataclasses.replace(
            cfg, mesh_shape={"data": devices.n_devices, "model": 1})

    cfg.validate()
    log.info("platform initialized", extra={"fields": {
        "host": dataclasses.asdict(host),
        "devices": {k: v for k, v in dataclasses.asdict(devices).items()
                    if k != "coords"},
        "cloud": dataclasses.asdict(cloud),
    }})
    return PlatformInit(host=host, devices=devices, cloud=cloud,
                        effective_config=cfg)
