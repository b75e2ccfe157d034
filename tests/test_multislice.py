"""Multi-slice (DCN-aware) placement on the virtual 8-device CPU mesh.

Real multi-slice hardware is unreachable here; these tests simulate
slice boundaries over the 8 CPU devices (2 slices x 4) and verify the
three things the design claims (parallel/multislice.py): the model axis
never crosses a slice, the standard sharding helpers work unchanged on
the multislice mesh (forward + train-step equality with the
single-device math), and the session router keeps per-chunk traffic
slice-sticky.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.parallel import (SliceRouter, TrainBatch,
                                                assert_ici_contained,
                                                init_training,
                                                make_multislice_mesh,
                                                make_optimizer,
                                                make_train_step,
                                                shard_params, slice_groups,
                                                slice_of_row)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    return Transducer.from_preset("tiny")


# -- placement invariants ---------------------------------------------------

def test_mesh_rows_stay_inside_slices():
    groups = slice_groups(n_slices=2)
    mesh = make_multislice_mesh(tp=2, n_slices=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert_ici_contained(mesh, groups)
    # contiguous slice blocks along the data axis: rows 0-1 slice 0,
    # rows 2-3 slice 1 (the router's placement table)
    assert slice_of_row(mesh, groups) == [0, 0, 1, 1]


def test_mesh_full_slice_tp():
    groups = slice_groups(n_slices=2)
    mesh = make_multislice_mesh(tp=4, n_slices=2)
    assert mesh.shape == {"data": 2, "model": 4}
    assert_ici_contained(mesh, groups)
    assert slice_of_row(mesh, groups) == [0, 1]


def test_mesh_rejects_bad_factorizations():
    with pytest.raises(ValueError):
        make_multislice_mesh(tp=3, n_slices=2)   # 4 devices % 3
    with pytest.raises(ValueError):
        slice_groups(n_slices=3)                 # 8 devices % 3


def test_ici_containment_catches_bad_placement():
    """A hand-built mesh whose TP row straddles the simulated slice
    boundary must be rejected — the invariant is load-bearing."""
    from jax.sharding import Mesh
    devs = jax.devices()
    groups = [devs[:4], devs[4:]]
    bad = np.empty((4, 2), dtype=object)
    # row 1 pairs a slice-0 device with a slice-1 device
    order = [devs[0], devs[1], devs[3], devs[4],
             devs[2], devs[5], devs[6], devs[7]]
    for i in range(4):
        bad[i, 0], bad[i, 1] = order[2 * i], order[2 * i + 1]
    mesh = Mesh(bad, ("data", "model"))
    with pytest.raises(AssertionError, match="crosses slices"):
        assert_ici_contained(mesh, groups)


# -- numerics ride the existing helpers unchanged ---------------------------

def test_tp_forward_matches_single_on_multislice_mesh(model):
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_multislice_mesh(tp=2, n_slices=2)
    sharded = shard_params(mesh, params)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((4, model.config.n_mels, 32)), jnp.float32)
    lens = jnp.array([32, 20, 28, 16])
    enc_ref, lens_ref = model.encode(params, feats, lens)
    enc_ms, lens_ms = jax.jit(model.encode)(sharded, feats, lens)
    np.testing.assert_array_equal(np.asarray(lens_ref), np.asarray(lens_ms))
    np.testing.assert_allclose(np.asarray(enc_ref), np.asarray(enc_ms),
                               atol=2e-4, rtol=1e-3)


def test_train_step_matches_single_on_multislice_mesh(model):
    """dp-across-slices x tp-within-slice training step: only the grad
    all-reduce crosses the simulated DCN; loss equals single-device."""
    optimizer = make_optimizer(lr=1e-3)
    mesh = make_multislice_mesh(tp=2, n_slices=2)
    rng = np.random.default_rng(0)
    b, n, u = 4, 3200, 4
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32),
        audio_lens=jnp.array([n, n - 800, n, n - 400], jnp.int32),
        labels=jnp.asarray(rng.integers(0, model.config.blank_id, (b, u)),
                           jnp.int32),
        label_lens=jnp.array([u, 2, u, 3], jnp.int32))

    params0, opt0 = init_training(model, jax.random.PRNGKey(1), optimizer)
    step0 = make_train_step(model, optimizer)
    _, _, loss_single = step0(params0, opt0, batch)

    params, opt_state = init_training(model, jax.random.PRNGKey(1),
                                      optimizer, mesh)
    step = make_train_step(model, optimizer, mesh)(params, opt_state)
    _, _, loss_ms = step(params, opt_state, batch)
    np.testing.assert_allclose(float(loss_ms), float(loss_single),
                               rtol=2e-4)


# -- session routing --------------------------------------------------------

def test_router_least_loaded_and_sticky():
    r = SliceRouter(n_slices=2, lanes_per_slice=2)
    assert r.assign("a") == 0
    assert r.assign("b") == 1        # least-loaded, not round-robin luck
    assert r.assign("c") == 0
    assert r.assign("a") == 0        # sticky re-assign is a no-op
    assert r.to_dict()["load"] == [2, 1]
    r.release("a")
    assert r.to_dict()["load"] == [1, 1]


def test_router_sheds_at_capacity():
    r = SliceRouter(n_slices=2, lanes_per_slice=1)
    assert r.assign("a") is not None
    assert r.assign("b") is not None
    assert r.assign("c") is None     # 503-shed upstream
    r.release("b")
    assert r.assign("c") is not None


def test_router_concurrent_assign_release():
    import threading
    r = SliceRouter(n_slices=4, lanes_per_slice=64)

    def churn(tag):
        for i in range(200):
            sid = f"{tag}-{i}"
            assert r.assign(sid) is not None
            r.release(sid)

    ts = [threading.Thread(target=churn, args=(k,)) for k in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    d = r.to_dict()
    assert d["load"] == [0, 0, 0, 0] and d["sessions"] == 0
