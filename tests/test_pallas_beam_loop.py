"""Whole-beam-loop Pallas kernel vs the XLA beam scan (interpret mode).

Bit-exact equivalence in f32: same pool scores/lens, same backtrace
arrays, same decoded n-best after host backtrace — including the
structural tie cases (dead hypotheses at NEG_INF every frame) that make
first-index tie-breaking load-bearing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.beam import backtrace, beam_decode, BeamTrace
from amira_rust_asr_server_tpu.ops.pallas.beam_loop import beam_loop_pallas


def _setup(seed=0, b=2, t=7):
    model = Transducer.from_preset("tiny")
    cfg = model.config
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(
        rng.standard_normal((b, t, cfg.d_enc)).astype(np.float32))
    enc_lens = jnp.asarray(([t, t - 3, t - 1, t - 2] * b)[:b], jnp.int32)
    enc_pre = model.joint_precompute_enc(params, enc)
    return model, cfg, params, enc_pre, enc_lens


def _run_xla(model, cfg, params, enc_pre, enc_lens, beam, s_max, bias):
    return beam_decode(
        partial(model.predict_step, params),
        partial(model.joint_step_pre, params),
        enc_pre, enc_lens,
        model.init_state(enc_pre.shape[0]),
        cfg.blank_id, beam_width=beam, max_expansions=s_max,
        bias=bias, vocab_size=cfg.vocab_size)


def _run_kernel(model, cfg, params, enc_pre, enc_lens, beam, s_max, bias):
    h, c = model.init_state(enc_pre.shape[0])
    bias_vec = (jnp.zeros((cfg.vocab_size,), jnp.float32)
                if bias is None else bias)
    outs = beam_loop_pallas(
        enc_pre, enc_lens, h, c, bias_vec,
        params["predictor"], params["joint"],
        beam_width=beam, max_expansions=s_max, blank_id=cfg.blank_id,
        interpret=True)
    scores, lens, expp, expt, pps, ppk = outs
    return BeamTrace(pool_scores=scores, pool_lens=lens,
                     exp_parent=expp, exp_token=expt,
                     pool_parent_s=pps, pool_parent_k=ppk,
                     pool_final=jnp.ones(scores.shape, bool))


@pytest.mark.parametrize("bias_on", [False, True])
@pytest.mark.slow
def test_kernel_matches_xla_beam(bias_on):
    model, cfg, params, enc_pre, enc_lens = _setup()
    bias = None
    if bias_on:
        rng = np.random.default_rng(7)
        bias = jnp.asarray(
            (rng.standard_normal(cfg.vocab_size) * 0.5).astype(np.float32))
    want = _run_xla(model, cfg, params, enc_pre, enc_lens, 3, 2, bias)
    got = _run_kernel(model, cfg, params, enc_pre, enc_lens, 3, 2, bias)

    np.testing.assert_allclose(np.asarray(got.pool_scores),
                               np.asarray(want.pool_scores),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(got.pool_lens),
                          np.asarray(want.pool_lens))
    assert np.array_equal(np.asarray(got.exp_parent),
                          np.asarray(want.exp_parent))
    assert np.array_equal(np.asarray(got.exp_token),
                          np.asarray(want.exp_token))
    assert np.array_equal(np.asarray(got.pool_parent_s),
                          np.asarray(want.pool_parent_s))
    assert np.array_equal(np.asarray(got.pool_parent_k),
                          np.asarray(want.pool_parent_k))

    # decoded n-best equal end to end
    w = backtrace(want, np.asarray(enc_lens), n_best=3)
    g = backtrace(got, np.asarray(enc_lens), n_best=3)
    assert np.array_equal(g.tokens, w.tokens)
    assert np.array_equal(g.counts, w.counts)
    np.testing.assert_allclose(g.scores, w.scores, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_kernel_matches_xla_beam_wider():
    """Larger beam + 3 expansions + uneven lengths."""
    model, cfg, params, enc_pre, enc_lens = _setup(seed=3, b=3, t=9)
    want = _run_xla(model, cfg, params, enc_pre, enc_lens, 4, 3, None)
    got = _run_kernel(model, cfg, params, enc_pre, enc_lens, 4, 3, None)
    np.testing.assert_allclose(np.asarray(got.pool_scores),
                               np.asarray(want.pool_scores),
                               rtol=1e-5, atol=1e-5)
    w = backtrace(want, np.asarray(enc_lens), n_best=2)
    g = backtrace(got, np.asarray(enc_lens), n_best=2)
    assert np.array_equal(g.tokens, w.tokens)
    assert np.array_equal(g.counts, w.counts)


def test_pipeline_kernel_wiring_matches_xla():
    """The pipeline's Pallas-beam branch (arg order, bias-None default,
    BeamTrace assembly) — exercised via _beam_trace_via_kernel in
    interpret mode, since the backend gate keeps the branch off on CPU."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model, cfg, params, enc_pre, enc_lens = _setup(seed=5)
    pipe = AsrPipeline(model, params,
                       Vocabulary.from_map({i: f"w{i}" for i in range(9)}),
                       Config(audio_sec_buckets=[0.5], batch_buckets=[2],
                              decoding_mode="beam", beam_width=3,
                              compute_dtype="float32"))
    got = pipe._beam_trace_via_kernel(
        pipe.params, enc_pre, enc_lens, None,
        beam_width=3, max_expansions=2, interpret=True)
    want = _run_xla(model, cfg, pipe.params, enc_pre, enc_lens, 3, 2, None)
    w = backtrace(want, np.asarray(enc_lens), n_best=2)
    g = backtrace(got, np.asarray(enc_lens), n_best=2)
    assert np.array_equal(g.tokens, w.tokens)
    assert np.array_equal(g.counts, w.counts)
    assert bool(np.all(np.asarray(got.pool_final)))


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.slow
def test_kernel_graph_constraint_matches_xla(weighted):
    """Decoding-graph-constrained kernel == XLA beam: legality masking,
    arc weights during pruning, graph-state advance, strict finality +
    final weights (applied via the pipeline tail)."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.ops.beam import TokenTrie
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model, cfg, params, enc_pre, enc_lens = _setup(seed=11, b=2, t=7)
    rng = np.random.default_rng(4)
    seqs = [[0, 1], [2], [3, 4, 5], [1, 2]]
    graph = TokenTrie.from_token_seqs(
        seqs, vocab_size=cfg.vocab_size, loop=True,
        weights=(list(rng.standard_normal(4)) if weighted else None),
        final_weights=(list(rng.standard_normal(4)) if weighted else None))

    want = beam_decode(
        partial(model.predict_step, params),
        partial(model.joint_step_pre, params),
        enc_pre, enc_lens, model.init_state(enc_pre.shape[0]),
        cfg.blank_id, beam_width=3, max_expansions=2,
        bias=None, vocab_size=cfg.vocab_size, graph=graph)

    pipe = AsrPipeline(model, params,
                       Vocabulary.from_map({i: f"w{i}" for i in range(9)}),
                       Config(audio_sec_buckets=[0.5], batch_buckets=[2],
                              decoding_mode="beam", beam_width=3,
                              compute_dtype="float32"))
    got = pipe._beam_trace_via_kernel(
        pipe.params, enc_pre, enc_lens, None, graph=graph,
        beam_width=3, max_expansions=2, interpret=True)

    np.testing.assert_allclose(np.asarray(got.pool_scores),
                               np.asarray(want.pool_scores),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(got.pool_lens),
                          np.asarray(want.pool_lens))
    assert np.array_equal(np.asarray(got.pool_final),
                          np.asarray(want.pool_final))
    assert np.array_equal(np.asarray(got.exp_token),
                          np.asarray(want.exp_token))
    w = backtrace(want, np.asarray(enc_lens), n_best=2)
    g = backtrace(got, np.asarray(enc_lens), n_best=2)
    assert np.array_equal(g.tokens, w.tokens)
    assert np.array_equal(g.counts, w.counts)
    np.testing.assert_allclose(g.scores, w.scores, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_int8_resident_beam_tokens_match_on_trained_checkpoint():
    """int8-resident LSTM weights (config.int8_decode_weights) in the beam
    kernel: on a TRAINED checkpoint the top-1 transcript must match the
    f32 XLA beam token-for-token (bit-exact scores are not expected —
    the W8A8 LSTM perturbs hypothesis scores at the 1e-3 level, well
    inside trained-margin separations but outside float equality)."""
    import pathlib

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.pallas.decode_loop import \
        quantize_pred_lstm
    from amira_rust_asr_server_tpu.testing import synth_digits

    repo = pathlib.Path(__file__).resolve().parents[1]
    ckpt = repo / "model-repo" / "tiny-digits"
    if not ckpt.exists():
        pytest.skip("tiny-digits checkpoint not present")
    model = Transducer.from_preset("tiny")
    params = model.load_checkpoint(str(ckpt))
    cfg = model.config

    rng = np.random.default_rng(3)
    utts = [["four", "zero"], ["six", "one", "eight"]]
    b, n = len(utts), 24000
    audio = np.zeros((b, n), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, words in enumerate(utts):
        w = synth_digits(words, noise=0.004, rng=rng)
        audio[i, :len(w)] = w[:n]
        lens[i] = min(len(w), n)
    feats, fl = log_mel_features(jnp.asarray(audio), jnp.asarray(lens),
                                 n_mels=cfg.n_mels)
    enc, el = model.encode(params, feats, fl)
    enc_pre = model.joint_precompute_enc(params, enc)

    want = beam_decode(
        partial(model.predict_step, params),
        partial(model.joint_step_pre, params),
        enc_pre, el, model.init_state(b), cfg.blank_id,
        beam_width=4, max_expansions=3, bias=None,
        vocab_size=cfg.vocab_size)

    h, c = model.init_state(b)
    pq = quantize_pred_lstm(params["predictor"])
    outs = beam_loop_pallas(
        enc_pre, el, h, c, jnp.zeros((cfg.vocab_size,), jnp.float32),
        params["predictor"], params["joint"], pq,
        beam_width=4, max_expansions=3, blank_id=cfg.blank_id,
        interpret=True)
    got = BeamTrace(pool_scores=outs[0], pool_lens=outs[1],
                    exp_parent=outs[2], exp_token=outs[3],
                    pool_parent_s=outs[4], pool_parent_k=outs[5],
                    pool_final=jnp.ones(outs[0].shape, bool))
    w = backtrace(want, np.asarray(el), n_best=1)
    g = backtrace(got, np.asarray(el), n_best=1)
    assert np.array_equal(g.tokens, w.tokens)
    assert np.array_equal(g.counts, w.counts)
    assert int(np.asarray(w.counts)[0]) >= 2  # really decoded speech
