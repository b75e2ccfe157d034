"""Thread-affinity planning and NUMA topology probe (utils/affinity.py).

Mirrors the reference's own test intent (ref:
src/platform/affinity_management.rs:614-617 — pinning recommended on big
hosts, not on small ones; numa_management.rs:503 — allocation alignment)
with real sched_get/setaffinity on the current host plus a synthetic
sysfs tree for the multi-node cases this box can't produce.
"""

import concurrent.futures
import os

import pytest

from amira_rust_asr_server_tpu.utils.affinity import (
    AffinityPlan, CpuTopology, NumaNode, ThreadType, make_initializer,
    parse_cpulist, recommended_allocation_size, set_thread_affinity)


def test_parse_cpulist():
    assert parse_cpulist("0-3,8,10-11") == (0, 1, 2, 3, 8, 10, 11)
    assert parse_cpulist("5") == (5,)
    assert parse_cpulist("") == ()
    assert parse_cpulist("2-2") == (2,)


def _fake_sysfs(tmp_path, node_cpulists):
    for node_id, cpulist in node_cpulists.items():
        d = tmp_path / "devices/system/node" / f"node{node_id}"
        d.mkdir(parents=True)
        (d / "cpulist").write_text(cpulist + "\n")
    return str(tmp_path)


def test_topology_detect_from_sysfs(tmp_path, monkeypatch):
    root = _fake_sysfs(tmp_path, {0: "0-3", 1: "4-7"})
    monkeypatch.setattr(os, "sched_getaffinity",
                        lambda pid: set(range(8)), raising=False)
    topo = CpuTopology.detect(sysfs_root=root)
    assert [n.node_id for n in topo.nodes] == [0, 1]
    assert topo.nodes[0].cores == (0, 1, 2, 3)
    assert topo.nodes[1].cores == (4, 5, 6, 7)
    assert topo.available == tuple(range(8))


def test_topology_respects_cgroup_cpuset(tmp_path, monkeypatch):
    """Cores outside sched_getaffinity (container cpuset) are dropped;
    empty nodes disappear entirely."""
    root = _fake_sysfs(tmp_path, {0: "0-3", 1: "4-7"})
    monkeypatch.setattr(os, "sched_getaffinity",
                        lambda pid: {1, 2}, raising=False)
    topo = CpuTopology.detect(sysfs_root=root)
    assert len(topo.nodes) == 1
    assert topo.nodes[0].cores == (1, 2)


def test_topology_no_sysfs_falls_back_to_single_node(tmp_path, monkeypatch):
    monkeypatch.setattr(os, "sched_getaffinity",
                        lambda pid: {0, 1}, raising=False)
    topo = CpuTopology.detect(sysfs_root=str(tmp_path / "nope"))
    assert topo.nodes == (NumaNode(0, (0, 1)),)


def test_plan_disabled_on_small_host():
    topo = CpuTopology(nodes=(NumaNode(0, (0,)),), available=(0,))
    plan = AffinityPlan.plan(topo)
    assert not plan.enabled
    assert "too small" in plan.reason
    # disabled plan yields no initializers and empty core sets
    assert make_initializer(plan, ThreadType.DISPATCH) is None
    assert plan.cores_for(ThreadType.SESSION) == ()


def test_plan_partitions_big_host():
    topo = CpuTopology(nodes=(NumaNode(0, (0, 1, 2, 3)),
                              NumaNode(1, (4, 5, 6, 7))),
                       available=tuple(range(8)))
    plan = AffinityPlan.plan(topo)
    assert plan.enabled
    io = plan.cores_for(ThreadType.IO)
    disp = plan.cores_for(ThreadType.DISPATCH)
    sess = plan.cores_for(ThreadType.SESSION)
    # IO and DISPATCH each get one dedicated core, disjoint from sessions
    assert len(io) == 1 and len(disp) == 1
    assert not (set(io) | set(disp)) & set(sess)
    assert set(io) | set(disp) | set(sess) == set(range(8))
    # the feeder sits on the device-adjacent node, off the IRQ core
    assert disp[0] in topo.nodes[0].cores and disp[0] != io[0]
    # background shares the session pool
    assert plan.cores_for(ThreadType.BACKGROUND) == sess


def test_set_thread_affinity_roundtrip():
    if not hasattr(os, "sched_getaffinity"):
        pytest.skip("no sched_getaffinity on this platform")
    before = os.sched_getaffinity(0)
    try:
        core = min(before)
        assert set_thread_affinity((core,))
        assert os.sched_getaffinity(0) == {core}
    finally:
        os.sched_setaffinity(0, before)


def test_set_thread_affinity_invalid_core_returns_false():
    assert set_thread_affinity((99999,)) is False
    assert set_thread_affinity(()) is False


def test_executor_initializer_pins_workers():
    if not hasattr(os, "sched_getaffinity"):
        pytest.skip("no sched_getaffinity on this platform")
    core = min(os.sched_getaffinity(0))
    plan = AffinityPlan(True, "test", {ThreadType.DISPATCH: (core,)})
    init = make_initializer(plan, ThreadType.DISPATCH)
    with concurrent.futures.ThreadPoolExecutor(
            max_workers=1, initializer=init) as ex:
        got = ex.submit(lambda: os.sched_getaffinity(0)).result()
    assert got == {core}


def test_recommended_allocation_size(tmp_path):
    thp = tmp_path / "kernel/mm/transparent_hugepage"
    thp.mkdir(parents=True)
    (thp / "enabled").write_text("always [madvise] never\n")
    root = str(tmp_path)
    huge = 2 * 1024 * 1024
    # big buffer with THP -> 2 MiB alignment
    assert recommended_allocation_size(huge + 1, root) == 2 * huge
    assert recommended_allocation_size(huge, root) == huge
    # small buffer -> page alignment even with THP on
    assert recommended_allocation_size(100, root) == 4096
    # THP off -> page alignment regardless of size
    (thp / "enabled").write_text("always madvise [never]\n")
    assert recommended_allocation_size(huge + 1, root) == huge + 4096
    # missing sysfs -> page alignment
    assert recommended_allocation_size(8192, str(tmp_path / "x")) == 8192


def test_appstate_wires_affinity_plan(monkeypatch):
    """enable_cpu_affinity=True computes a plan at AppState init (disabled
    here — this box is too small — but recorded with its reason)."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.server.state import AppState
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    import jax

    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    cfg = Config(enable_cpu_affinity=True, warmup_on_start=False,
                 audio_sec_buckets=[0.5], batch_buckets=[1],
                 compute_dtype="float32")
    state = AppState(AsrPipeline(model, params, vocab, cfg), vocab, cfg)
    try:
        assert state.affinity_plan is not None
        assert isinstance(state.affinity_plan.enabled, bool)
        assert state.affinity_plan.reason
    finally:
        state.close()

    cfg_off = Config(warmup_on_start=False, audio_sec_buckets=[0.5],
                     batch_buckets=[1], compute_dtype="float32")
    state_off = AppState(AsrPipeline(model, params, vocab, cfg_off),
                         vocab, cfg_off)
    try:
        assert state_off.affinity_plan is None
    finally:
        state_off.close()
