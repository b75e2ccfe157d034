"""Host CPU topology, NUMA probe, and thread-affinity planning.

TPU-native analogue of the reference's NUMA/affinity managers (ref:
src/platform/numa_management.rs:34-399 NumaManager topology detection +
cloud-based disabling + allocation-size recommendations;
src/platform/affinity_management.rs:36-529 AffinityManager thread-type
core sets + recommendations; src/performance/affinity.rs:27-324 CpuSet /
spawn_with_affinity).

On a TPU VM the host's only latency-critical job is *feeding the chip*:
the device-dispatch thread that launches XLA executables and stages
host->device transfers. The honest equivalent of the reference's
GPU-era machinery therefore keeps the capability surface — sysfs NUMA
topology probe, small-host disabling, per-thread-type core partitioning,
huge-page-aware allocation alignment — but sizes the plan for the feeder
role: DISPATCH gets a dedicated core on the device-adjacent node, IO
(the asyncio event loop) gets its own core, and SESSION workers (weave /
buffer CPU work) share the remainder. Memory *binding* (libnuma
set_mempolicy) is deliberately absent: XLA's host allocator owns pinned
staging buffers and re-binding under it is fighting the runtime — the
same reasoning the reference applies when it disables NUMA on
single-node cloud instances (numa_management.rs:105).

Everything degrades gracefully: detection failures, containers with
restricted cpusets, and small hosts all yield a disabled plan with a
recorded reason instead of an error (ref: AffinityManager::disable,
affinity_management.rs:377).
"""

from __future__ import annotations

import dataclasses
import enum
import glob
import os
from typing import Callable, Dict, Optional, Tuple

from ..reliability import get_logger

log = get_logger("asr.affinity")


class ThreadType(enum.Enum):
    """Thread roles the plan partitions cores between (ref:
    affinity_management.rs ThreadType — inference/io/background)."""

    DISPATCH = "dispatch"      # device feeder: XLA launches + H2D staging
    IO = "io"                  # asyncio event loop / network
    SESSION = "session"        # per-stream CPU work (weaving, buffers)
    BACKGROUND = "background"  # warmup, metrics, checkpoints


def parse_cpulist(text: str) -> Tuple[int, ...]:
    """Parse a sysfs cpulist like ``0-3,8,10-11`` into a sorted tuple."""
    cores = set()
    for part in text.strip().split(","):
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-", 1)
            cores.update(range(int(lo), int(hi) + 1))
        else:
            cores.add(int(part))
    return tuple(sorted(cores))


@dataclasses.dataclass(frozen=True)
class NumaNode:
    node_id: int
    cores: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class CpuTopology:
    """NUMA-node → core map, restricted to this process's cpuset.

    Restricting to ``sched_getaffinity`` (not ``os.cpu_count()``) matters
    in containers: pinning to a core outside the cgroup cpuset raises
    EINVAL, which is exactly the failure mode the reference's
    should_disable_numa_for_cloud guards (numa_management.rs:105-182).
    """

    nodes: Tuple[NumaNode, ...]
    available: Tuple[int, ...]

    @classmethod
    def detect(cls, sysfs_root: str = "/sys") -> "CpuTopology":
        try:
            available = tuple(sorted(os.sched_getaffinity(0)))
        except (AttributeError, OSError):  # non-Linux fallback
            available = tuple(range(os.cpu_count() or 1))
        nodes = []
        for path in sorted(glob.glob(
                os.path.join(sysfs_root, "devices/system/node/node[0-9]*"))):
            try:
                with open(os.path.join(path, "cpulist")) as f:
                    cores = tuple(c for c in parse_cpulist(f.read())
                                  if c in available)
            except OSError:
                continue
            if cores:
                node_id = int(os.path.basename(path)[len("node"):])
                nodes.append(NumaNode(node_id, cores))
        if not nodes:
            nodes = [NumaNode(0, available)]
        return cls(nodes=tuple(nodes), available=available)


@dataclasses.dataclass(frozen=True)
class AffinityPlan:
    """Core assignment per thread type, or a disabled plan with a reason.

    The partition mirrors the reference's recommendation logic
    (affinity_management.rs:442-491: pin only when the host is big
    enough, dedicate cores to the latency-critical pool, share the
    rest), re-derived for the TPU feeder model.
    """

    enabled: bool
    reason: str
    assignments: Dict[ThreadType, Tuple[int, ...]] = \
        dataclasses.field(default_factory=dict)

    MIN_CORES = 4  # below this, partitioning just starves the host

    @classmethod
    def plan(cls, topology: Optional[CpuTopology] = None) -> "AffinityPlan":
        topo = topology or CpuTopology.detect()
        cores = topo.available
        if len(cores) < cls.MIN_CORES:
            return cls(False, f"host too small to partition "
                              f"({len(cores)} < {cls.MIN_CORES} cores)")
        # Device-adjacent node: without a PCIe-locality probe the first
        # node is the convention (TPU-VM hosts are single-node; on
        # multi-node hosts the runtime's staging threads start there).
        node0 = topo.nodes[0].cores or cores
        # core 0 catches IRQs on most kernels — give it to IO (which is
        # interrupt-driven anyway) and keep the feeder off it.
        io_core = cores[0]
        dispatch_core = next((c for c in node0 if c != io_core),
                             cores[1])
        rest = tuple(c for c in cores if c not in (io_core, dispatch_core))
        return cls(True, "partitioned", {
            ThreadType.IO: (io_core,),
            ThreadType.DISPATCH: (dispatch_core,),
            ThreadType.SESSION: rest,
            ThreadType.BACKGROUND: rest,
        })

    def cores_for(self, thread_type: ThreadType) -> Tuple[int, ...]:
        return self.assignments.get(thread_type, ())


def set_thread_affinity(cores: Tuple[int, ...]) -> bool:
    """Pin the *calling* thread; False (never raise) on failure (ref:
    set_current_thread_affinity, affinity_management.rs:529)."""
    if not cores:
        return False
    try:
        os.sched_setaffinity(0, set(cores))
        return True
    except (AttributeError, OSError, ValueError) as e:
        log.warning("affinity pin failed", extra={"fields": {
            "cores": list(cores), "error": str(e)}})
        return False


def make_initializer(plan: AffinityPlan,
                     thread_type: ThreadType) -> Optional[Callable[[], None]]:
    """ThreadPoolExecutor ``initializer`` that pins each new worker to the
    plan's cores for ``thread_type`` (ref: spawn_with_affinity,
    performance/affinity.rs:244). None when the plan is disabled, so
    callers can pass it straight through."""
    if not plan.enabled:
        return None
    cores = plan.cores_for(thread_type)
    if not cores:
        return None

    def _init() -> None:
        set_thread_affinity(cores)

    return _init


def recommended_allocation_size(requested: int,
                                sysfs_root: str = "/sys") -> int:
    """Round a host-buffer size up to the huge-page/page boundary the
    kernel can actually back (ref: get_recommended_allocation_size,
    numa_management.rs:281-310): 2 MiB when transparent huge pages are
    available and the buffer is big enough to use one, else 4 KiB."""
    huge = 2 * 1024 * 1024
    page = 4096
    thp = os.path.join(sysfs_root, "kernel/mm/transparent_hugepage/enabled")
    try:
        with open(thp) as f:
            mode = f.read()
        enabled = "[always]" in mode or "[madvise]" in mode
    except OSError:
        enabled = False
    align = huge if (enabled and requested >= huge) else page
    return ((requested + align - 1) // align) * align
