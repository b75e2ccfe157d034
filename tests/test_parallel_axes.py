"""Pipeline (PP), fully-sharded (FSDP) and sequence-parallel (SP) axes
on the virtual 8-device CPU mesh — equality against the single-device
math is the bar (GSPMD/shard_map must not change results).

These complete the sharding inventory next to test_parallel.py's TP/DP:
every axis the framework claims (tp/dp/pp/sp/fsdp) has an executable
equality check here or there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.parallel import (TrainBatch, init_training,
                                                loss_fn, make_mesh,
                                                make_optimizer,
                                                make_param_shardings,
                                                make_pp_mesh,
                                                make_seq_parallel_loss,
                                                make_train_step,
                                                pipeline_encode)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    return Transducer.from_preset("tiny")


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def _feats(rng, b=4, t=64, n_mels=32):
    feats = jnp.asarray(rng.standard_normal((b, n_mels, t)) * 0.3,
                        jnp.float32)
    lens = jnp.asarray([t, t - 8, t - 16, t // 2][:b], jnp.int32)
    return feats, lens


def _batch(rng, model, b=4):
    n, u = 3200, 4
    return TrainBatch(
        audio=jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32),
        audio_lens=jnp.asarray([n, n - 800, n, n - 400][:b], jnp.int32),
        labels=jnp.asarray(
            rng.integers(0, model.config.blank_id, (b, u)), jnp.int32),
        label_lens=jnp.asarray([u, 2, u, 3][:b], jnp.int32))


# -- pipeline parallelism ---------------------------------------------------

def test_pipeline_encode_matches_single(model, params, rng):
    """GPipe over 2 stages x 2 microbatches == the plain forward."""
    feats, lens = _feats(rng)
    ref, ref_lens = jax.jit(model.encode)(params, feats, lens)
    mesh = make_pp_mesh(2)
    out, out_lens = pipeline_encode(model, params, feats, lens,
                                    mesh, n_microbatches=2)
    np.testing.assert_array_equal(np.asarray(ref_lens), np.asarray(out_lens))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_encode_more_microbatches_than_stages(model, params, rng):
    """M > S exercises the steady-state wavefront (bubble amortization)."""
    feats, lens = _feats(rng, b=8)
    lens = jnp.asarray([64, 56, 48, 32, 64, 40, 64, 24], jnp.int32)
    ref, _ = jax.jit(model.encode)(params, feats, lens)
    mesh = make_pp_mesh(2)
    out, _ = pipeline_encode(model, params, feats, lens,
                             mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_encode_single_stage_degenerates(model, params, rng):
    """S=1 is the no-op pipeline; must still match exactly."""
    feats, lens = _feats(rng)
    ref, _ = jax.jit(model.encode)(params, feats, lens)
    mesh = make_pp_mesh(1)
    out, _ = pipeline_encode(model, params, feats, lens,
                             mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_backward_matches_single(model, params, rng):
    """Grads flow back through ppermute/scan: d(sum(enc))/d(block params)
    must equal the single-device gradient (the backward wavefront)."""
    feats, lens = _feats(rng)
    mesh = make_pp_mesh(2)

    def f_ref(p):
        enc, _ = model.encode(p, feats, lens)
        return jnp.sum(enc * enc)

    def f_pp(p):
        enc, _ = pipeline_encode(model, p, feats, lens, mesh,
                                 n_microbatches=2)
        return jnp.sum(enc * enc)

    g_ref = jax.grad(f_ref)(params)["encoder"]
    g_pp = jax.grad(f_pp)(params)["encoder"]
    for key in ("block0", "block1", "subsampler", "out_proj"):
        # f32 accumulation-order noise through psum/scan: abs tolerance
        # dominates (observed max abs diff ~3e-5 on grads of O(1-10))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4),
            g_ref[key], g_pp[key])


def test_pipeline_rejects_bad_factorizations(model, params, rng):
    feats, lens = _feats(rng)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_encode(model, params, feats, lens, make_pp_mesh(2),
                        n_microbatches=3)  # batch 4 % 3 != 0


# -- FSDP (ZeRO-3 style parameter sharding over the data axis) --------------

def test_fsdp_shards_params_over_data_axis(model, params):
    mesh = make_mesh({"data": 4, "model": 2})
    sh = make_param_shardings(mesh, params, fsdp=True)
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh)]
    n_data_sharded = sum("data" in s for s in specs)
    # every 2D+ param whose free dim divides 4 must be data-sharded;
    # tiny has dozens of those
    assert n_data_sharded >= 20, specs
    # TP assignments are preserved alongside
    assert any("model" in s and "data" in s for s in specs)


def test_fsdp_train_step_matches_unsharded(model):
    optimizer = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(0)
    batch = _batch(rng, model)

    p0, o0 = init_training(model, jax.random.PRNGKey(0), optimizer)
    step0 = make_train_step(model, optimizer)
    _, _, loss_ref = step0(p0, o0, batch)

    mesh = make_mesh({"data": 4, "model": 2})
    p1, o1 = init_training(model, jax.random.PRNGKey(0), optimizer,
                           mesh, fsdp=True)
    step1 = make_train_step(model, optimizer, mesh)(p1, o1)
    p1b, _, loss_fsdp = step1(p1, o1, batch)

    np.testing.assert_allclose(float(loss_ref), float(loss_fsdp),
                               rtol=2e-4)
    # params stay FSDP-sharded after the step (no silent regather)
    lstm_w = p1b["predictor"]["lstm"][0]["w"]
    assert "data" in lstm_w.sharding.spec or "model" in lstm_w.sharding.spec


# -- sequence parallelism ----------------------------------------------------

def test_seq_parallel_loss_matches_unsharded(model):
    optimizer = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(1)
    batch = _batch(rng, model)

    p0, o0 = init_training(model, jax.random.PRNGKey(0), optimizer)
    _, _, loss_ref = make_train_step(model, optimizer)(p0, o0, batch)

    mesh = make_mesh({"data": 2, "model": 4})
    p1, o1 = init_training(model, jax.random.PRNGKey(0), optimizer, mesh)
    sp_loss = make_seq_parallel_loss(mesh)
    step = make_train_step(model, optimizer, mesh, loss=sp_loss)(p1, o1)
    _, _, loss_sp = step(p1, o1, batch)

    np.testing.assert_allclose(float(loss_ref), float(loss_sp), rtol=2e-4)


def test_seq_parallel_ctc_loss_matches(tmp_path):
    from amira_rust_asr_server_tpu.models.ctc import CTCModel
    from amira_rust_asr_server_tpu.parallel import ctc_loss_fn

    model = CTCModel.from_preset("tiny")
    optimizer = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(2)
    batch = _batch(rng, model)

    p0, o0 = init_training(model, jax.random.PRNGKey(0), optimizer)
    _, _, loss_ref = make_train_step(model, optimizer,
                                     loss=ctc_loss_fn)(p0, o0, batch)

    mesh = make_mesh({"data": 2, "model": 4})
    p1, o1 = init_training(model, jax.random.PRNGKey(0), optimizer, mesh)
    sp_loss = make_seq_parallel_loss(mesh, base="ctc")
    step = make_train_step(model, optimizer, mesh, loss=sp_loss)(p1, o1)
    _, _, loss_sp = step(p1, o1, batch)

    np.testing.assert_allclose(float(loss_ref), float(loss_sp), rtol=2e-4)
