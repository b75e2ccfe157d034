"""Continuous batcher tests: coalescing, correctness vs solo decode,
length-bucket grouping, error fan-out."""

import asyncio
import concurrent.futures

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.runtime.batcher import ContinuousBatcher
from amira_rust_asr_server_tpu.vocab import Vocabulary

# compile-heavy integration tier: run with the full suite, skip via -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5, 1.0], batch_buckets=[1, 2, 4, 8],
                 max_symbols_per_step=5, max_total_tokens=50,
                 batch_window_ms=30.0)
    return AsrPipeline(model, params, vocab, cfg)


def test_concurrent_submits_coalesce(pipeline):
    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=50.0)
        await batcher.start()
        rng = np.random.default_rng(0)
        waves = [(rng.standard_normal(4000) * 0.1).astype(np.float32)
                 for _ in range(6)]
        results = await asyncio.gather(
            *[batcher.submit(w) for w in waves])
        await batcher.stop()
        return waves, results, batcher.stats.to_json()

    waves, results, stats = asyncio.run(go())
    # fewer dispatches than requests => real coalescing happened
    assert stats["dispatches"] < 6
    assert stats["lanes_total"] == 6
    # every result matches its solo decode
    for w, (tr, st) in zip(waves, results):
        solo = pipeline.process_batch_samples(w)
        assert tr.tokens == solo.tokens
        assert st.tokens_emitted == len(tr.tokens)


def test_mixed_lengths_grouped_by_bucket(pipeline):
    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=50.0)
        await batcher.start()
        rng = np.random.default_rng(1)
        short = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        long = (rng.standard_normal(12000) * 0.1).astype(np.float32)
        res = await asyncio.gather(batcher.submit(short),
                                   batcher.submit(long),
                                   batcher.submit(short))
        await batcher.stop()
        return res, batcher.stats.to_json()

    res, stats = asyncio.run(go())
    # grouping by bucket: 2 dispatches (one 0.5 s bucket pair, one 1.0 s)
    assert stats["dispatches"] == 2
    assert all(isinstance(tr.text, str) for tr, _ in res)


def test_stream_state_rides_batches(pipeline):
    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=10.0)
        await batcher.start()
        rng = np.random.default_rng(2)
        w = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        tr1, st1 = await batcher.submit(w)
        tr2, st2 = await batcher.submit(w, st1)
        await batcher.stop()
        return tr1, st1, tr2, st2

    tr1, st1, tr2, st2 = asyncio.run(go())
    assert st2.tokens_emitted == st1.tokens_emitted + len(tr2.tokens)


def test_error_fans_out(pipeline):
    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=10.0)
        await batcher.start()
        with pytest.raises(Exception):
            await batcher.submit(None)  # malformed: no .shape
        # dispatcher must survive and serve the next request
        w = np.zeros(2000, np.float32)
        tr, _ = await batcher.submit(w)
        assert isinstance(tr.text, str)
        await batcher.stop()

    asyncio.run(go())


def test_submit_from_thread(pipeline):
    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        workers = concurrent.futures.ThreadPoolExecutor(4)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=30.0)
        await batcher.start()
        rng = np.random.default_rng(3)
        w = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        loop = asyncio.get_running_loop()
        futs = [loop.run_in_executor(
            workers, batcher.submit_from_thread, w) for _ in range(4)]
        out = await asyncio.gather(*futs)
        await batcher.stop()
        return out

    out = asyncio.run(go())
    assert len(out) == 4
    first = out[0][0].tokens
    assert all(tr.tokens == first for tr, _ in out)


def test_stream_flood_cannot_starve_batch_admission(pipeline):
    """Per-class admission: filling the stream class to its bound must
    neither reject a batch submit nor keep it out of the next dispatches
    (round-robin packing interleaves both classes)."""
    from amira_rust_asr_server_tpu.errors import CapacityExceededError

    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipeline, ex, window_ms=30.0)
        await batcher.start()
        rng = np.random.default_rng(5)
        w = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        # fill the stream class exactly to its admission bound
        stream_futs = [
            asyncio.ensure_future(batcher.submit(w, kind="stream"))
            for _ in range(batcher._maxsize)]
        await asyncio.sleep(0)  # let them enqueue
        with pytest.raises(CapacityExceededError):
            await batcher.submit(w, kind="stream")  # stream class is full
        # ...but the batch class still admits and completes
        tr, _ = await asyncio.wait_for(batcher.submit(w, kind="batch"),
                                       timeout=30)
        await asyncio.gather(*stream_futs)
        await batcher.stop()
        return tr

    tr = asyncio.run(go())
    assert isinstance(tr.text, str)


def test_fair_take_interleaves_classes(pipeline):
    """_take_fair alternates classes instead of draining one FIFO."""
    ex = concurrent.futures.ThreadPoolExecutor(1)
    batcher = ContinuousBatcher(pipeline, ex, window_ms=1.0, max_lanes=4)
    for i in range(6):
        batcher._pending["stream"].append(("s", None, i))
    batcher._pending["batch"].append(("b", None, 99))
    taken = batcher._take_fair()
    assert len(taken) == 4
    # the lone batch item rides the very next dispatch despite 6 queued
    # stream items ahead of it
    assert ("b", None, 99) in taken


def test_beam_mode_batcher_coalesces():
    """Beam-mode requests share one (batch x beam) device call and return
    full Transcriptions with n-best."""
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1, 2, 4],
                 decoding_mode="beam", beam_width=4, beam_n_best=2,
                 compute_dtype="float32", batch_window_ms=30.0)
    pipe = AsrPipeline(model, params, vocab, cfg)

    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipe, ex, window_ms=50.0)
        await batcher.start()
        rng = np.random.default_rng(4)
        waves = [(rng.standard_normal(4000) * 0.1).astype(np.float32)
                 for _ in range(3)]
        results = await asyncio.gather(*[batcher.submit(w) for w in waves])
        await batcher.stop()
        return waves, results, batcher.stats.to_json()

    waves, results, stats = asyncio.run(go())
    assert stats["dispatches"] < 3  # coalesced
    for w, (tr, st) in zip(waves, results):
        assert st is None  # no stream state in beam mode
        solo = pipe.process_batch_samples(w)
        assert tr.tokens == solo.tokens
        assert tr.n_best is not None and tr.n_best[0]["text"] == tr.text
