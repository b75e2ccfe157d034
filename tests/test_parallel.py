"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.parallel import (TrainBatch, init_training,
                                                make_mesh, make_optimizer,
                                                make_param_shardings,
                                                make_train_step,
                                                shard_params)

# compile-heavy integration tier: run with the full suite, skip via -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    return Transducer.from_preset("tiny")


def test_mesh_shapes():
    mesh = make_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}
    mesh_dp = make_mesh()
    assert mesh_dp.shape["data"] == 8


def test_param_shardings_tensor_parallel(model):
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 2, "model": 4})
    sh = make_param_shardings(mesh, params)
    # the embed table [16, 32]: 16 % 4 == 0 -> sharded on model axis
    spec = sh["predictor"]["embed"].spec
    assert spec[0] == "model"
    # LSTM gate matrix [in+h, 4h]: output dim sharded
    spec = sh["predictor"]["lstm"][0]["w"].spec
    assert spec[-1] == "model"
    sharded = shard_params(mesh, params)
    # placing must preserve values
    np.testing.assert_allclose(
        np.asarray(sharded["joint"]["out"]["w"]),
        np.asarray(params["joint"]["out"]["w"]))


def test_sharded_train_step_runs_and_matches_single(model):
    """One pjit'd train step on a 2x4 mesh: loss finite, and equal to the
    unsharded step's loss (GSPMD must not change the math)."""
    optimizer = make_optimizer(lr=1e-3)
    mesh = make_mesh({"data": 2, "model": 4})
    rng = np.random.default_rng(0)
    b, n, u = 2, 3200, 4
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32),
        audio_lens=jnp.array([n, n - 800], jnp.int32),
        labels=jnp.asarray(rng.integers(0, model.config.blank_id, (b, u)),
                           jnp.int32),
        label_lens=jnp.array([u, 2], jnp.int32),
    )

    # single-device baseline
    params0, opt0 = init_training(model, jax.random.PRNGKey(1), optimizer)
    step0 = make_train_step(model, optimizer)
    p1, o1, loss_single = step0(params0, opt0, batch)

    # sharded
    params, opt_state = init_training(model, jax.random.PRNGKey(1),
                                      optimizer, mesh)
    step_builder = make_train_step(model, optimizer, mesh)
    step = step_builder(params, opt_state)
    params2, opt2, loss_sharded = step(params, opt_state, batch)

    assert np.isfinite(float(loss_sharded))
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=2e-4)
    # a second step runs from the returned state (donation-safe plumbing)
    params3, opt3, loss2 = step(params2, opt2, batch)
    assert np.isfinite(float(loss2))
    assert float(loss2) < float(loss_sharded)  # it is learning the batch


def test_data_parallel_inference_sharding(model):
    """Greedy decode with batch sharded over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer

    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 8, "model": 1})
    rng = np.random.default_rng(1)
    b, t = 8, 12
    enc = jnp.asarray(rng.standard_normal((b, t, model.config.d_enc)),
                      jnp.float32)
    enc_sharded = jax.device_put(
        enc, NamedSharding(mesh, P("data", None, None)))
    lens = jax.device_put(jnp.full((b,), t, jnp.int32),
                          NamedSharding(mesh, P("data")))
    res_sharded = greedy_decode_transducer(model, params, enc_sharded, lens)
    res_local = greedy_decode_transducer(model, params, enc, jnp.full((b,), t))
    np.testing.assert_array_equal(np.asarray(res_sharded.tokens),
                                  np.asarray(res_local.tokens))


def test_tensor_parallel_inference_matches_single(model):
    """Encoder forward with TP-sharded params (model axis) must equal the
    unsharded forward — GSPMD inserts the collectives, not the math."""
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 1, "model": 4})
    sharded = shard_params(mesh, params)

    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((2, model.config.n_mels, 32)), jnp.float32)
    lens = jnp.array([32, 20])

    enc_ref, lens_ref = model.encode(params, feats, lens)
    enc_tp, lens_tp = jax.jit(model.encode)(sharded, feats, lens)
    np.testing.assert_array_equal(np.asarray(lens_ref), np.asarray(lens_tp))
    np.testing.assert_allclose(np.asarray(enc_ref), np.asarray(enc_tp),
                               atol=2e-4, rtol=1e-3)


def test_synthetic_data_pipeline(model):
    from amira_rust_asr_server_tpu.parallel.data import synthetic_batches
    gen = synthetic_batches(4, 8000, 8, model.config.vocab_size,
                            model.config.blank_id)
    batch = next(gen)
    assert batch.audio.shape == (4, 8000)
    assert batch.labels.shape == (4, 8)
    assert (np.asarray(batch.audio_lens) > 0).all()
    assert (np.asarray(batch.label_lens) > 0).all()
    assert (np.asarray(batch.labels) < model.config.blank_id).all()


def test_pipeline_tp_sharded_matches_unsharded(model):
    """End-to-end pipeline with TP-sharded params == unsharded pipeline."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1, 2],
                 compute_dtype="float32")
    plain = AsrPipeline(model, params, vocab, cfg)
    mesh = make_mesh({"data": 2, "model": 4})
    sharded = AsrPipeline(model, params, vocab, cfg, mesh=mesh)

    rng = np.random.default_rng(11)
    w = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    t_plain = plain.process_batch_samples(w)
    t_tp = sharded.process_batch_samples(w)
    assert t_plain.tokens == t_tp.tokens
    assert t_plain.text == t_tp.text


def test_lane_engine_tp_sharded_matches_unsharded():
    """Native streaming chunk step with TP-sharded params emits the same
    tokens as the unsharded engine — the multi-chip story covers the
    streaming path, not just batch greedy (SURVEY §2.9)."""
    import dataclasses
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.models.presets import TINY
    from amira_rust_asr_server_tpu.runtime.lane_engine import (
        StreamingLaneEngine)
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(2.0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})

    def run(mesh):
        eng = StreamingLaneEngine(model, params, vocab, n_lanes=2,
                                  chunk_frames=16, norm="none", mesh=mesh)
        lane = eng.attach()
        wave = (np.random.default_rng(17).standard_normal(16000) * 0.3
                ).astype(np.float32)
        for i in range(0, wave.shape[0], 3200):
            eng.feed(lane, wave[i:i + 3200])
            eng.tick()
        eng.feed(lane, np.zeros(0, np.float32), final=True)
        eng.drain(lane)
        return eng.tokens[lane]

    plain = run(None)
    tp = run(make_mesh({"data": 2, "model": 4}))
    assert plain == tp and len(plain) > 0


def test_remat_training_matches_no_remat():
    """Rematerialized blocks change memory, not math."""
    import dataclasses
    import jax.numpy as jnp
    from amira_rust_asr_server_tpu.models.presets import TINY
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.parallel import loss_fn

    base = Transducer(TINY)
    remat = Transducer(dataclasses.replace(TINY, remat=True))
    params = base.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((2, 3200)) * 0.1, jnp.float32),
        audio_lens=jnp.array([3200, 2400], jnp.int32),
        labels=jnp.asarray(rng.integers(0, 15, (2, 4)), jnp.int32),
        label_lens=jnp.array([4, 2], jnp.int32))

    l1, g1 = jax.value_and_grad(lambda p: loss_fn(base, p, batch))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss_fn(remat, p, batch))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_ctc_tp_sharded_matches_unsharded():
    """The CTC family rides the same structural TP shardings: fused
    forward+greedy-collapse with sharded params == unsharded, token for
    token (the head [d_enc, V] is column-parallel)."""
    from amira_rust_asr_server_tpu.models import CTCModel

    model = CTCModel.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 2, "model": 4})
    sh = make_param_shardings(mesh, params)
    # tiny head [d_enc=64, V=16]: d_out < d_in -> row-parallel on d_enc
    assert sh["head"]["w"].spec[0] == "model"

    rng = np.random.default_rng(12)
    cfg = model.config
    feats = jnp.asarray(rng.standard_normal((2, cfg.n_mels, 64)) * 0.3,
                        jnp.float32)
    lens = jnp.array([64, 40], jnp.int32)

    t_plain, c_plain = jax.jit(model.decode_greedy)(params, feats, lens)
    sharded = shard_params(mesh, params)
    with mesh:
        t_tp, c_tp = jax.jit(model.decode_greedy)(sharded, feats, lens)
    np.testing.assert_array_equal(np.asarray(c_plain), np.asarray(c_tp))
    np.testing.assert_array_equal(np.asarray(t_plain), np.asarray(t_tp))


def test_ctc_sharded_train_step():
    """CTC training shards over the same data x model mesh: one step on
    the 8-device mesh updates params and returns a finite loss."""
    from amira_rust_asr_server_tpu.models import CTCModel
    from amira_rust_asr_server_tpu.parallel import ctc_loss_fn

    model = CTCModel.from_preset("tiny")
    mesh = make_mesh({"data": 2, "model": 4})
    optimizer = make_optimizer(lr=1e-3)
    params, opt_state = init_training(
        model, jax.random.PRNGKey(0), optimizer, mesh)
    step = make_train_step(model, optimizer, mesh,
                           loss=ctc_loss_fn)(params, opt_state)

    rng = np.random.default_rng(13)
    b, n = 2, 3200
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32),
        audio_lens=jnp.full((b,), n, jnp.int32),
        labels=jnp.asarray(
            rng.integers(0, model.config.blank_id, (b, 3)), jnp.int32),
        label_lens=jnp.full((b,), 3, jnp.int32),
    )
    before = np.asarray(params["head"]["w"])  # copy: the step donates params
    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(params["head"]["w"]), before)
