"""Cold-compile avoidance: warm-bucket tracking, batcher packing caps,
pad-up-to-warm dispatch, bounded admission queue, background warmup.

These lock in the fix for the cold-bucket 504 trap: a request budgeted for
a warm dispatch must never ride into a bucket that still needs an XLA
compile (on TPU a cold flagship bucket compiles for ~1 min; the old
behavior packed warm-budgeted bursts into cold batch buckets).
"""

import asyncio
import concurrent.futures

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.errors import CapacityExceededError
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.runtime.batcher import ContinuousBatcher
from amira_rust_asr_server_tpu.vocab import Vocabulary

# compile-heavy integration tier: run with the full suite, skip via -m 'not slow'
pytestmark = pytest.mark.slow


def make_pipeline(**overrides) -> AsrPipeline:
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    kwargs = dict(audio_sec_buckets=[0.5], batch_buckets=[1, 2, 4],
                  max_symbols_per_step=5, max_total_tokens=50)
    kwargs.update(overrides)
    return AsrPipeline(model, params, vocab, Config(**kwargs))


def test_warm_tracking_per_mode():
    pipe = make_pipeline()
    assert not pipe.is_warm(1, 4000)
    assert pipe.warm_batch_cap(4000) == 0
    pipe.warmup()  # batch=1 across length buckets, greedy mode
    assert pipe.is_warm(1, 4000)
    assert pipe.warm_batch_cap(4000) == 1
    # beam warmth is tracked separately
    assert not pipe.is_warm(1, 4000, mode="beam")
    pipe.decode_beam_batch([np.zeros(4000, np.float32)])
    assert pipe.is_warm(1, 4000, mode="beam")


def test_on_compile_hook_counts_new_buckets():
    pipe = make_pipeline()
    hits = []
    pipe.on_compile = lambda: hits.append(1)
    w = np.zeros(4000, np.float32)
    pipe.decode_samples_batch([w])
    assert len(hits) == 1
    pipe.decode_samples_batch([w])  # same bucket: no new compile
    assert len(hits) == 1
    pipe.decode_samples_batch([w, w])  # new batch bucket
    assert len(hits) == 2


def test_dispatch_pads_up_to_warm_bucket():
    """2 requests with only (4, n) warm must ride the warm 4-lane program
    instead of compiling a cold (2, n)."""
    pipe = make_pipeline()
    w = np.zeros(4000, np.float32)
    pipe.decode_samples_batch([w, w, w])  # compiles (4, n)
    assert pipe.is_warm(4, 4000) and not pipe.is_warm(2, 4000)
    compiles = []
    pipe.on_compile = lambda: compiles.append(1)
    res, *_ = pipe.decode_samples_batch([w, w])
    assert not compiles  # padded up: no new program
    assert res.tokens.shape[0] == 4  # rode the 4-lane bucket
    assert not pipe.is_warm(2, 4000)  # (2, n) still never compiled


def test_batcher_splits_burst_to_warm_cap():
    """A burst at a pipeline with only batch=1 warm dispatches as singles
    on the warm program (no cold-bucket stall); once the big bucket is
    warm the same burst coalesces."""
    pipe = make_pipeline(batch_window_ms=30.0)
    pipe.warmup()  # batch=1 only

    async def burst(n):
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipe, ex, window_ms=50.0)
        await batcher.start()
        rng = np.random.default_rng(0)
        waves = [(rng.standard_normal(4000) * 0.1).astype(np.float32)
                 for _ in range(n)]
        before = batcher.stats.to_json()["dispatches"]
        # warm-budget timeout: every dispatch must hit a compiled program
        res = await asyncio.wait_for(
            asyncio.gather(*[batcher.submit(w) for w in waves]), timeout=60)
        after = batcher.stats.to_json()["dispatches"]
        await batcher.stop()
        return after - before, res

    dispatches, res = asyncio.run(burst(4))
    assert dispatches == 4  # split to the warm cap (1)
    assert all(isinstance(tr.text, str) for tr, _ in res)

    pipe._warm_one(4, 4000)  # as background warmup would
    dispatches, _ = asyncio.run(burst(4))
    assert dispatches == 1  # now coalesces into the warm (4, n) program


def test_background_warmup_compiles_all_buckets():
    pipe = make_pipeline()
    pipe.warmup()
    pipe.start_background_warmup()
    pipe._warmup_thread.join(timeout=120)
    for b in (1, 2, 4):
        assert pipe.is_warm(b, 4000), f"bucket ({b}, 0.5s) not warmed"


def test_warm_one_beam_compiles_natural_bucket():
    """Beam-mode _warm_one must compile the bucket it was asked for, even
    when a LARGER beam bucket is already warm — decode_beam_batch's
    warm-redirect would otherwise route the request up and never compile
    the target, so warmup finishes with the small bucket cold forever and
    every small group pads to the big bucket's (batch x beam) lanes."""
    pipe = make_pipeline(decoding_mode="beam", beam_width=2)
    # a 16-request-style burst compiles the LARGEST bucket first
    pipe._warm_one(4, 4000)
    assert pipe.is_warm(4, 4000, mode="beam")
    assert not pipe.is_warm(2, 4000, mode="beam")
    # warming the small bucket must actually compile it (not redirect)
    pipe._warm_one(2, 4000)
    assert pipe.is_warm(2, 4000, mode="beam")


def test_breaker_ignores_capacity_rejections():
    """Admission-control rejections are load signals, not device-health
    signals: they must pass through the breaker uncounted, or a traffic
    burst trips it and turns graceful 503 load-shedding into a full
    30 s outage (and permanent flapping in HALF_OPEN)."""
    from amira_rust_asr_server_tpu.reliability.circuit_breaker import (
        CircuitBreaker, CircuitState)

    cb = CircuitBreaker(failure_threshold=2,
                        excluded_exceptions=(CapacityExceededError,))

    def reject():
        raise CapacityExceededError("queue full")

    for _ in range(10):
        with pytest.raises(CapacityExceededError):
            cb.call(reject)
    assert cb.state is CircuitState.CLOSED
    assert cb.total_failures == 0
    # real device failures still trip it
    def boom():
        raise RuntimeError("device fell over")
    for _ in range(2):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    assert cb.state is CircuitState.OPEN


def test_bounded_queue_rejects_overflow():
    pipe = make_pipeline(inference_queue_size=2, batch_buckets=[1, 2])

    async def go():
        ex = concurrent.futures.ThreadPoolExecutor(1)
        batcher = ContinuousBatcher(pipe, ex)
        # batcher NOT started: queue fills (maxsize = max(2, max_bucket)=2)
        loop = asyncio.get_running_loop()
        w = np.zeros(2000, np.float32)
        f1 = loop.create_task(batcher.submit(w))
        f2 = loop.create_task(batcher.submit(w))
        await asyncio.sleep(0)  # let both enqueue
        with pytest.raises(CapacityExceededError):
            await batcher.submit(w)
        f1.cancel()
        f2.cancel()

    asyncio.run(go())
