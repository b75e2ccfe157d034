"""Streaming beam: carried-hypothesis equivalence with whole-utterance
beam search, plus the StreamingBeamSession surface.

The semantic lock: a beam scan seeded from the previous chunk's
BeamCarry must equal the single whole-utterance scan bit-for-bit —
same pool scores, same winning token sequence (ops/beam.py
beam_decode(init_beam=..., return_carry=True)). Parity-plus over the
reference's batch-only k2 beam (k2_decoder_backend.cc:63-253).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.ops.beam import (
    NEG_INF, TokenTrie, backtrace, backtrace_carry, beam_decode,
    beam_decode_transducer)
from amira_rust_asr_server_tpu.runtime.beam_stream import \
    StreamingBeamSession
from amira_rust_asr_server_tpu.vocab import Vocabulary

BLANK = 3
VOCAB = 4


def fake_pred(tokens, state):
    return tokens[:, None].astype(jnp.float32), state


def scripted_joint(seed):
    """Joint depending on (frame, last token): enough structure that the
    beam reorders hypotheses across chunks."""
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((VOCAB, VOCAB)) * 2.0
    table = table - np.log(np.exp(table).sum(axis=1, keepdims=True))
    jt = jnp.asarray(table, jnp.float32)

    def joint(enc_frame, pred_out):
        last = jnp.clip(pred_out[:, 0].astype(jnp.int32), 0, VOCAB - 1)
        return jt[last] + enc_frame[:, :1] * 0.3

    return joint


def _run_full(joint, enc, t, k=4, s=2, graph=None):
    return beam_decode(fake_pred, joint, enc, jnp.asarray([t]),
                       (jnp.zeros((1, 1, 1)),), BLANK, beam_width=k,
                       max_expansions=s, vocab_size=VOCAB, graph=graph)


def _run_chunked(joint, enc, t1, t2, k=4, s=2, graph=None):
    """Two seeded chunks; returns (final trace, spliced hists)."""
    trace1, carry = beam_decode(
        fake_pred, joint, enc[:, :t1], jnp.asarray([t1]),
        (jnp.zeros((1, 1, 1)),), BLANK, beam_width=k, max_expansions=s,
        vocab_size=VOCAB, graph=graph, return_carry=True)
    origins, seqs = backtrace_carry(trace1, np.array([t1]))
    hists = [seqs[0][kk] for kk in range(k)]
    # re-parent identity on a fresh first chunk: every live hyp descends
    # from initial hypothesis 0
    scores1 = np.asarray(trace1.pool_scores)[0]
    for kk in range(k):
        if scores1[kk] > NEG_INF / 2:
            assert origins[0, kk] == 0
    trace2, carry2 = beam_decode(
        fake_pred, joint, enc[:, t1:t1 + t2], jnp.asarray([t2]),
        None, BLANK, beam_width=k, max_expansions=s, vocab_size=VOCAB,
        graph=graph, init_beam=carry, return_carry=True)
    origins2, seqs2 = backtrace_carry(trace2, np.array([t2]))
    hists = [hists[int(origins2[0, kk])] + seqs2[0][kk]
             for kk in range(k)]
    return trace2, hists


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
@pytest.mark.parametrize("split", [(3, 3), (1, 5), (4, 2)])
def test_chunked_equals_full_scripted(seed, split):
    joint = scripted_joint(seed)
    t1, t2 = split
    t = t1 + t2
    rng = np.random.default_rng(100 + seed)
    enc = jnp.asarray(rng.standard_normal((1, t, 2)), jnp.float32)

    full = _run_full(joint, enc, t)
    chunked, hists = _run_chunked(joint, enc, t1, t2)

    np.testing.assert_allclose(np.asarray(full.pool_scores),
                               np.asarray(chunked.pool_scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.pool_lens),
                                  np.asarray(chunked.pool_lens))
    res = backtrace(full, np.array([t]))
    want = [int(x) for x in res.tokens[0, :res.counts[0]]]
    best = int(np.argmax(np.asarray(chunked.pool_scores)[0]))
    assert hists[best] == want


@pytest.mark.parametrize("seed", [0, 4])
def test_chunked_equals_full_with_graph(seed):
    joint = scripted_joint(seed)
    graph = TokenTrie.from_token_seqs([[0], [0, 1], [2]], vocab_size=VOCAB,
                                      loop=True,
                                      weights=[0.5, -0.25, 0.0],
                                      final_weights=[0.0, 0.1, -0.3])
    t1, t2 = 3, 3
    t = t1 + t2
    rng = np.random.default_rng(7 + seed)
    enc = jnp.asarray(rng.standard_normal((1, t, 2)), jnp.float32)

    full = _run_full(joint, enc, t, graph=graph)
    chunked, hists = _run_chunked(joint, enc, t1, t2, graph=graph)

    # last-chunk trace includes end-of-utterance final weights, like the
    # full run — totals and finality must agree
    np.testing.assert_allclose(np.asarray(full.pool_scores),
                               np.asarray(chunked.pool_scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.pool_final),
                                  np.asarray(chunked.pool_final))
    res = backtrace(full, np.array([t]))
    want = [int(x) for x in res.tokens[0, :res.counts[0]]]
    scores = np.asarray(chunked.pool_scores)[0]
    final_ok = np.asarray(chunked.pool_final)[0]
    best = int(np.argmax(np.where(final_ok, scores, scores - 1e12)))
    assert hists[best] == want


def test_carry_scores_exclude_final_weights():
    """The carry is mid-stream state: graph final weights must NOT leak
    into carried scores (they'd double-count on the next chunk)."""
    joint = scripted_joint(0)
    graph = TokenTrie.from_token_seqs([[0]], vocab_size=VOCAB, loop=True,
                                      final_weights=[5.0])
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((1, 3, 2)), jnp.float32)
    trace, carry = beam_decode(
        fake_pred, joint, enc, jnp.asarray([3]), (jnp.zeros((1, 1, 1)),),
        BLANK, beam_width=4, max_expansions=2, vocab_size=VOCAB,
        graph=graph, return_carry=True)
    ts = np.asarray(trace.pool_scores)[0]
    cs = np.asarray(carry.scores)[0]
    lens = np.asarray(trace.pool_lens)[0]
    fin = np.asarray(graph.is_final)[np.asarray(carry.g_state)[0]]
    for k in range(4):
        if ts[k] <= NEG_INF / 2:
            continue
        want = 5.0 if (fin[k] and lens[k] > 0) else 0.0
        assert ts[k] - cs[k] == pytest.approx(want, abs=1e-5)


# ---------------------------------------------------------------------------
# StreamingBeamSession (real tiny causal model)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def causal_model():
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    return model, params, vocab


def _bias(cfg, boosts):
    """Shallow-fusion bias making selected emissions score-POSITIVE: an
    untrained model's MAP path is all-blank (every emission adds a <=0
    term), which would make these session tests vacuously compare empty
    transcripts. lp + bias > 0 makes the beam genuinely emit, so carry /
    splicing bugs can't hide behind emptiness."""
    b = np.zeros((cfg.vocab_size,), np.float32)
    for tok, w in boosts.items():
        b[tok] = w
    return jnp.asarray(b)


@pytest.mark.slow
def test_session_feed_size_invariance(causal_model, rng):
    model, params, vocab = causal_model
    bias = _bias(model.config, {2: 8.0, 5: 7.5})
    n = 16000
    wave = (rng.standard_normal(n) * 0.3).astype(np.float32)
    results = []
    for feed_size in (16000, 4000, 1600):
        sess = StreamingBeamSession(model, params, vocab, chunk_frames=16,
                                    norm="none", beam_width=4, bias=bias)
        for i in range(0, n, feed_size):
            sess.feed(wave[i:i + feed_size])
        tr = sess.end()
        results.append(tr.tokens)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0  # non-vacuous: the beam really emits


@pytest.mark.slow
def test_session_matches_batch_beam(causal_model, rng):
    """End-of-stream best hypothesis == the batch beam decode over the
    same chunked causal encoder outputs (same chunk size, norm off)."""
    from amira_rust_asr_server_tpu.ops.streaming import (encode_chunk,
                                                         init_encoder_cache)

    model, params, vocab = causal_model
    cfg = model.config
    bias = _bias(cfg, {2: 8.0, 5: 7.5})
    n = 16000
    wave = (rng.standard_normal(n) * 0.3).astype(np.float32)

    sess = StreamingBeamSession(model, params, vocab, chunk_frames=16,
                                norm="none", beam_width=4, bias=bias)
    sess.feed(wave)
    tr = sess.end()

    # reference: same featurizer + chunked encoder, ONE beam scan
    from amira_rust_asr_server_tpu.runtime.native_stream import \
        StreamingFeaturizer
    feat = StreamingFeaturizer(cfg.n_mels, "none")
    frames = feat.feed(wave, final=True)  # [T, M]
    cache = init_encoder_cache(cfg, 1, jnp.float32)
    encs = []
    t = 0
    while t < frames.shape[0]:
        chunk = frames[t:t + 16]
        real = chunk.shape[0]
        if real < 16:
            chunk = np.concatenate(
                [chunk, np.zeros((16 - real, cfg.n_mels), np.float32)])
        enc, cache = encode_chunk(params["encoder"], cfg,
                                  jnp.asarray(chunk.T[None]), cache)
        encs.append(np.asarray(enc)[:, : -(-real // cfg.subsampling_factor)])
        t += 16
    enc_full = jnp.asarray(np.concatenate(encs, axis=1))
    res = beam_decode_transducer(
        model, params, enc_full,
        jnp.asarray([enc_full.shape[1]], jnp.int32), beam_width=4,
        bias=bias)
    want = [int(x) for x in res.tokens[0, :res.counts[0]]]
    assert len(want) > 0  # non-vacuous: the beam really emits
    assert tr.tokens == want
    assert tr.score == pytest.approx(float(res.scores[0]), abs=1e-3)


def test_session_stable_is_prefix_of_partial(causal_model, rng):
    model, params, vocab = causal_model
    bias = _bias(model.config, {2: 8.0, 5: 7.5, 9: 7.8})
    wave = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    sess = StreamingBeamSession(model, params, vocab, chunk_frames=16,
                                norm="none", beam_width=4, bias=bias)
    for i in range(0, 16000, 3200):
        sess.feed(wave[i:i + 3200])
        stable = sess.stable_tokens()
        partial = sess.partial_tokens()
        assert partial[:len(stable)] == stable
        # stable must be a prefix of EVERY live hypothesis
        scores = np.asarray(sess.carry.scores)[0] if sess.carry else []
        for k, sc in enumerate(scores):
            if sc > NEG_INF / 2:
                assert sess.hists[k][:len(stable)] == stable


def test_session_empty_stream(causal_model):
    model, params, vocab = causal_model
    sess = StreamingBeamSession(model, params, vocab, chunk_frames=16,
                                norm="none", beam_width=4)
    tr = sess.end()
    assert tr.tokens == []
    assert tr.text == ""


@pytest.mark.slow
def test_session_graph_constrains_stream(causal_model, rng):
    """A decoding graph rides the streaming beam: emissions stay
    graph-legal and the end-of-stream winner is a complete phrase."""
    model, params, vocab = causal_model
    graph = TokenTrie.from_token_seqs([[2], [2, 5]],
                                      vocab_size=model.config.vocab_size,
                                      loop=True)
    # boost an OFF-grammar token hardest: the graph must win
    bias = _bias(model.config, {2: 8.0, 5: 7.5, 11: 9.0})
    wave = (rng.standard_normal(12000) * 0.3).astype(np.float32)
    sess = StreamingBeamSession(model, params, vocab, chunk_frames=16,
                                norm="none", beam_width=4, graph=graph,
                                bias=bias)
    sess.feed(wave)
    tr = sess.end()
    assert len(tr.tokens) > 0  # non-vacuous
    # legal strings are concatenations of [2] and [2,5]; 11 never appears
    i = 0
    while i < len(tr.tokens):
        assert tr.tokens[i] == 2, tr.tokens
        i += 1
        if i < len(tr.tokens) and tr.tokens[i] == 5:
            i += 1
