"""End-to-end pipeline tests (tiny model): bytes -> text, bucketing,
stream-state carry (ref surface: src/asr/pipeline.rs:21-67)."""

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.errors import InvalidAudioFormatError
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.vocab import Vocabulary


@pytest.fixture(scope="module")
def pipeline():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map(
        {i: f"▁w{i}" for i in range(15)})  # ids 0..14, blank=15
    cfg = Config(audio_sec_buckets=[0.5, 1.0], batch_buckets=[1, 2, 4],
                 max_symbols_per_step=5, max_total_tokens=50)
    return AsrPipeline(model, params, vocab, cfg)


def _pcm(rng, n):
    return (rng.integers(-3000, 3000, n, dtype=np.int16)).tobytes()


def test_process_batch_bytes(pipeline):
    rng = np.random.default_rng(0)
    tr = pipeline.process_batch(_pcm(rng, 4000))
    assert tr.audio_length_samples == 4000
    assert tr.features_length == 1 + 4000 // 160
    assert tr.encoded_length > 0
    assert isinstance(tr.text, str)
    assert all(0 <= t < 15 for t in tr.tokens)


def test_validation_errors(pipeline):
    with pytest.raises(InvalidAudioFormatError):
        pipeline.process_batch(b"")
    with pytest.raises(InvalidAudioFormatError):
        pipeline.process_batch(b"\x01\x02\x03")


def test_bucketing_determinism(pipeline):
    """Same audio must produce the same result regardless of which bucket
    (audio or batch padding) it rides in."""
    rng = np.random.default_rng(1)
    samples = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    t_solo = pipeline.process_batch_samples(samples)

    # ride in a larger batch bucket with a companion request
    other = (rng.standard_normal(7000) * 0.1).astype(np.float32)
    res, fl, el, _ = pipeline.decode_samples_batch([samples, other])
    count = int(res.counts[0])
    toks = [int(t) for t in np.asarray(res.tokens[0, :count])]
    assert toks == t_solo.tokens


def test_stream_state_carry(pipeline):
    """Chunked decode with carried state equals one-shot decode."""
    rng = np.random.default_rng(2)
    samples = (rng.standard_normal(8000) * 0.1).astype(np.float32)

    full = pipeline.process_batch_samples(samples)

    # NOTE: chunked-on-samples is NOT expected to equal full decode (the
    # encoder sees different windows); here we check the state plumbing:
    # decoding the same window twice with fresh vs carried state differs
    # only via the carried decoder state.
    tr1, st1 = pipeline.process_stream_samples(samples, None)
    assert tr1.tokens == full.tokens
    assert st1.tokens_emitted == len(tr1.tokens)

    tr2, st2 = pipeline.process_stream_samples(samples, st1)
    assert st2.tokens_emitted == st1.tokens_emitted + len(tr2.tokens)


def test_max_total_budget_is_per_decode_call(pipeline):
    """Every decode call gets a FRESH max_total budget — the reference's
    counter is local to each greedy_decode invocation
    (ref: decoder_optimized.rs:78-92,229-243). A session accumulator would
    silently mute any stream past max_total cumulative tokens."""
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(8000) * 0.5).astype(np.float32)
    st = None
    per_chunk = []
    for _ in range(12):
        tr, st = pipeline.process_stream_samples(samples, st)
        per_chunk.append(len(tr.tokens))
        # each call respects its own cap...
        assert len(tr.tokens) <= pipeline.config.max_total_tokens
    # ...but the session total may exceed it (loud random audio emits
    # steadily on the tiny random-weight model), and late chunks keep
    # emitting — the stream never goes silent at the budget boundary
    assert sum(per_chunk) > pipeline.config.max_total_tokens
    assert any(n > 0 for n in per_chunk[-3:])
    assert st.tokens_emitted == sum(per_chunk)  # session statistic intact


@pytest.mark.slow
def test_warmup_compiles(pipeline):
    assert pipeline.warmup(batch_sizes=[1], secs=[0.5]) == 1


@pytest.mark.slow
def test_beam_mode_pipeline():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_width=4)
    p = AsrPipeline(model, params, vocab, cfg)
    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    tr = p.process_batch_samples(samples)
    assert isinstance(tr.text, str)
    assert all(0 <= t < 15 for t in tr.tokens)
    assert tr.encoded_length > 0


def test_beam_decode_path_routing(monkeypatch):
    """Kernel-vs-scan routing is computed, counted, and stamped into the
    Transcription (round-3 verdict: a >1024-state grammar silently
    tripled latency with no visible cause)."""
    from amira_rust_asr_server_tpu.ops.beam import TokenTrie
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_width=2, use_pallas_beam_loop=True)
    p = AsrPipeline(model, params, vocab, cfg)

    # CPU backend: always the XLA scan
    assert p.beam_decode_path(None) == "xla_scan"

    # pretend we're on TPU: small graphs ride the kernel, big ones don't
    import amira_rust_asr_server_tpu.runtime.pipeline as pl
    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    small = TokenTrie.from_token_seqs([[1, 2]], vocab_size=15)
    assert p.beam_decode_path(None) == "pallas_kernel"
    assert p.beam_decode_path(small) == "pallas_kernel"
    n = p.PALLAS_GRAPH_MAX_STATES + 1
    big = TokenTrie.from_tables(
        np.full((n, 15), -1, np.int32), np.ones((n,), bool))
    assert p.beam_decode_path(big) == "xla_scan"
    monkeypatch.undo()

    # a real decode counts the decision and stamps the transcription
    paths = []
    p.on_beam_path = paths.append
    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    tr = p.process_batch_samples(samples)
    assert tr.decode_path == "xla_scan"
    assert p.decode_path_counts["xla_scan"] == 1
    assert paths == ["xla_scan"]
