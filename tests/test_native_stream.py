"""Native streaming session: featurizer exactness + chunking invariance."""

import dataclasses

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.constants import HOP_LENGTH
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.ops.features import log_mel_oracle
from amira_rust_asr_server_tpu.runtime.native_stream import (
    NativeStreamSession, StreamingFeaturizer)
from amira_rust_asr_server_tpu.vocab import Vocabulary


def test_featurizer_matches_batch_oracle(rng):
    n = 8000
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    f = StreamingFeaturizer(n_mels=128, norm="none")
    frames = f.feed(wave, final=True)
    want = log_mel_oracle(wave).T  # [T, n_mels], reflect-start/zero-end
    assert frames.shape[0] == 1 + n // HOP_LENGTH
    np.testing.assert_allclose(frames, want, atol=1e-3, rtol=1e-3)


def test_featurizer_incremental_equals_oneshot(rng):
    n = 12000
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    one = StreamingFeaturizer(n_mels=32, norm="none")
    all_frames = one.feed(wave, final=True)

    inc = StreamingFeaturizer(n_mels=32, norm="none")
    got = []
    for i in range(0, n, 1600):
        got.append(inc.feed(wave[i:i + 1600]))
    got.append(inc.feed(np.zeros(0, np.float32), final=True))
    got = np.concatenate(got, axis=0)
    assert got.shape == all_frames.shape
    np.testing.assert_allclose(got, all_frames, atol=1e-4)


@pytest.fixture(scope="module")
def causal_model():
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(2.0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    return model, params, vocab


def test_native_session_chunking_invariance(causal_model, rng):
    model, params, vocab = causal_model
    n = 16000
    wave = (rng.standard_normal(n) * 0.3).astype(np.float32)

    results = []
    for feed_size in (16000, 4000, 1600):
        sess = NativeStreamSession(model, params, vocab,
                                   chunk_frames=16, norm="none")
        for i in range(0, n, feed_size):
            sess.feed(wave[i:i + feed_size])
        tr = sess.end()
        results.append(tr.tokens)
    assert results[0] == results[1] == results[2]


def test_native_session_transcript_append_only(causal_model, rng):
    model, params, vocab = causal_model
    wave = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    sess = NativeStreamSession(model, params, vocab, chunk_frames=16,
                               norm="none")
    prev = ""
    for i in range(0, 16000, 3200):
        text = sess.feed(wave[i:i + 3200])
        assert text.startswith(prev)
        prev = text
    final = sess.end()
    assert final.text.startswith(prev)


def test_token_budget_is_per_chunk_step(causal_model, rng):
    """max_total budgets each decode call, NOT the session: the
    reference keeps the counter local to every greedy_decode invocation
    (ref: src/asr/decoder_optimized.rs:78-92,229-243), so long streams
    keep transcribing past max_total cumulative tokens."""
    model, params, vocab = causal_model
    # babble-prone params: undo the blank bias for this test
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(-2.0))
    sess = NativeStreamSession(model, params, vocab, chunk_frames=16,
                               norm="none", max_total=5)
    wave = (rng.standard_normal(32000) * 0.5).astype(np.float32)
    for i in range(0, 32000, 4000):
        sess.feed(wave[i:i + 4000])
    tr = sess.end()
    # a per-session budget would cap the whole stream at 5; per-call
    # budgets keep emitting chunk after chunk
    assert len(tr.tokens) > 5
