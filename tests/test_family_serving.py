"""CTC / AED model families on the full serving surface
(runtime/family_pipeline.py + Config.model_family wiring).

The reference serves one family (RNN-T, ref: src/asr/pipeline.rs); this
framework serves three. Strategy: pipeline-level decode must be
TOKEN-IDENTICAL to the model-level decoders (the pipelines add only
bucketing/padding, never semantics), and the HTTP surface must serve
batch + reject the transducer-only capabilities (WS streaming, lattice)
loudly at 400.
"""

import asyncio
import base64

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from aiohttp.test_utils import TestClient, TestServer

from amira_rust_asr_server_tpu import constants as C
from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.errors import ConfigValidationError
from amira_rust_asr_server_tpu.ops import log_mel_features
from amira_rust_asr_server_tpu.ops.ctc import (ctc_greedy_decode,
                                               ctc_greedy_decode_timed)
from amira_rust_asr_server_tpu.runtime.family_pipeline import (
    build_family_pipeline)
from amira_rust_asr_server_tpu.server import AppState, create_app
from amira_rust_asr_server_tpu.vocab import Vocabulary

_CACHE = {}


def make_family(family, **cfg_overrides):
    """(model, params, pipeline, vocab, cfg) for a tiny family pipeline;
    cached per override set (init + jit re-use across tests)."""
    key = (family, tuple(sorted(cfg_overrides.items())))
    if key not in _CACHE:
        vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
        cfg = Config(model_family=family, audio_sec_buckets=[0.5, 2.0],
                     batch_buckets=[1, 2], max_symbols_per_step=5,
                     max_total_tokens=50, compute_dtype="float32",
                     **cfg_overrides)
        model, params, pipe = build_family_pipeline(
            family, "tiny", vocab, cfg)
        _CACHE[key] = (model, params, pipe, vocab, cfg)
    return _CACHE[key]


def make_state(family, **cfg_overrides) -> AppState:
    model, params, pipe, vocab, cfg = make_family(family, **cfg_overrides)
    return AppState(pipe, vocab, cfg)


def run(coro):
    return asyncio.run(coro)


async def with_client(state, fn):
    app = create_app(state)
    async with TestClient(TestServer(app)) as client:
        return await fn(client)


def _samples(n, seed=0):
    rng = np.random.default_rng(seed)
    return (0.2 * rng.standard_normal(n)).astype(np.float32)


def _padded_bucket(samples_list, n_bucket):
    b = len(samples_list)
    audio = np.zeros((b, n_bucket), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, s in enumerate(samples_list):
        audio[i, :s.shape[0]] = s
        lens[i] = s.shape[0]
    return jnp.asarray(audio), jnp.asarray(lens)


# ---------------------------------------------------------------------------
# ops: timed CTC collapse
# ---------------------------------------------------------------------------
def test_ctc_timed_matches_untimed_collapse():
    rng = np.random.default_rng(3)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((4, 20, 7)).astype(np.float32)), -1)
    lens = jnp.asarray([20, 13, 1, 0], jnp.int32)
    t0, c0 = ctc_greedy_decode(logp, lens, 6)
    t1, c1, frames, confs = ctc_greedy_decode_timed(logp, lens, 6)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    for i in range(4):
        n = int(c0[i])
        np.testing.assert_array_equal(np.asarray(t0[i, :n]),
                                      np.asarray(t1[i, :n]))
        f = np.asarray(frames[i, :n])
        # first-frame-of-run timestamps: strictly increasing, in range
        assert (np.diff(f) > 0).all() if n > 1 else True
        assert (f < int(lens[i])).all()
        cf = np.asarray(confs[i, :n])
        assert ((cf > 0.0) & (cf <= 1.0)).all()
        # confidence IS the posterior at the emitting frame
        for j in range(n):
            assert cf[j] == pytest.approx(
                float(jnp.exp(logp[i, f[j], int(t1[i, j])])), rel=1e-5)


# ---------------------------------------------------------------------------
# pipeline-level == model-level (greedy)
# ---------------------------------------------------------------------------
def test_ctc_pipeline_matches_model_decode():
    model, params, pipe, _, _ = make_family("ctc")
    s = [_samples(3200, 1), _samples(7000, 2)]
    res, feat_lens, enc_lens, _ = pipe.decode_samples_batch(s)
    n_bucket = int(0.5 * C.SAMPLE_RATE)
    audio, lens = _padded_bucket(s, n_bucket)
    feats, fls = log_mel_features(audio, lens, n_mels=model.config.n_mels)
    enc, els = model.encode(params, feats, fls)
    toks, counts = ctc_greedy_decode(model.log_probs(params, enc), els,
                                     model.config.blank_id)
    np.testing.assert_array_equal(np.asarray(res.counts[:2]),
                                  np.asarray(counts))
    for i in range(2):
        n = int(counts[i])
        np.testing.assert_array_equal(np.asarray(res.tokens[i, :n]),
                                      np.asarray(toks[i, :n]))
    assert list(np.asarray(enc_lens[:2])) == list(np.asarray(els))


def test_aed_pipeline_matches_model_decode():
    model, params, pipe, _, cfg = make_family("aed")
    s = [_samples(3200, 5)]
    res, feat_lens, enc_lens, _ = pipe.decode_samples_batch(s)
    n_bucket = int(0.5 * C.SAMPLE_RATE)
    audio, lens = _padded_bucket(s, n_bucket)
    feats, fls = log_mel_features(audio, lens, n_mels=model.config.n_mels)
    toks, counts = model.decode_greedy_cached(
        params, feats, fls, max_len=cfg.max_total_tokens)
    assert int(res.counts[0]) == int(counts[0])
    n = int(counts[0])
    np.testing.assert_array_equal(np.asarray(res.tokens[0, :n]),
                                  np.asarray(toks[0, :n]))


# ---------------------------------------------------------------------------
# beam surfaces
# ---------------------------------------------------------------------------
def test_ctc_pipeline_beam_n_best():
    _, _, pipe, _, _ = make_family("ctc", decoding_mode="beam",
                                   beam_width=4)
    res, fls, els = pipe.decode_beam_batch(
        [_samples(3200, 7), _samples(3000, 8)], n_best=3)
    assert pipe.last_decode_path == "ctc_prefix_beam"
    assert len(res.n_best) == 2
    for i in range(2):
        scores = [sc for sc, _ in res.n_best[i]]
        assert scores == sorted(scores, reverse=True)
        # the best row IS the surfaced best hypothesis
        n = int(res.counts[i])
        assert res.n_best[i][0][1] == [int(t) for t in res.tokens[i][:n]]


def test_aed_pipeline_beam_n_best():
    _, _, pipe, _, _ = make_family("aed", decoding_mode="beam",
                                   beam_width=3)
    res, fls, els = pipe.decode_beam_batch([_samples(3200, 9)], n_best=2)
    assert pipe.last_decode_path == "aed_beam"
    assert len(res.n_best) == 1 and len(res.n_best[0]) == 2
    scores = [sc for sc, _ in res.n_best[0]]
    assert scores == sorted(scores, reverse=True)
    n = int(res.counts[0])
    assert res.n_best[0][0][1] == [int(t) for t in res.tokens[0][:n]]


def test_family_beam_warmup_uses_family_path():
    # base-class _warm_one would trace the TRANSDUCER beam forward and
    # crash on a CTC model; the override must route through the family's
    # own beam program
    _, _, pipe, _, _ = make_family("ctc", decoding_mode="beam",
                                   beam_width=4)
    n = pipe.warmup(secs=[0.5])
    assert n == 1 and pipe.is_warm(1, 3200, "beam")


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------
def _pcm(n=3200, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-3000, 3000, n, dtype=np.int16).tobytes()


@pytest.mark.parametrize("family", ["ctc", "aed"])
def test_family_batch_http_roundtrip(family):
    async def go(client):
        pcm = _pcm()
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(pcm).decode()})
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "COMPLETE"
        assert isinstance(body["transcription"], str)
        md = body["metadata"]
        assert md["audio_length_samples"] == len(pcm) // 2
        assert isinstance(md["tokens"], list)
    run(with_client(make_state(family), go))


def test_family_stream_rejected_400():
    async def go(client):
        resp = await client.get("/v2/decode/stream/default")
        assert resp.status == 400
        body = await resp.json()
        assert body["error"] == "unsupported_model_family"
    run(with_client(make_state("ctc"), go))


def test_family_lattice_rejected_400():
    async def go(client):
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(_pcm()).decode(),
                  "lattice": True})
        assert resp.status == 400
        body = await resp.json()
        assert "transducer" in body["message"]
    run(with_client(make_state("ctc", decoding_mode="beam",
                               beam_width=4), go))


def test_family_beam_http_n_best():
    async def go(client):
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(_pcm()).decode()})
        assert resp.status == 200
        body = await resp.json()
        assert body["metadata"]["decode_path"] == "ctc_prefix_beam"
    run(with_client(make_state("ctc", decoding_mode="beam",
                               beam_width=4), go))


# ---------------------------------------------------------------------------
# config wiring
# ---------------------------------------------------------------------------
def test_config_rejects_unknown_family():
    with pytest.raises(ConfigValidationError, match="model_family"):
        Config(model_family="rnnt-but-wrong").validate()


def test_config_rejects_native_streaming_for_families():
    with pytest.raises(ConfigValidationError, match="transducer"):
        Config(model_family="ctc", streaming_mode="native").validate()


def test_build_family_pipeline_unknown_family():
    vocab = Vocabulary.from_map({0: "a"})
    with pytest.raises(ValueError, match="unknown model family"):
        build_family_pipeline("nope", "tiny", vocab, Config())


# ---------------------------------------------------------------------------
# golden: the committed trained family checkpoints must make the FULL
# serving surface emit the exact expected transcript (the family analogue
# of tests/test_golden_e2e.py — trained weights, real text, over HTTP)
# ---------------------------------------------------------------------------
import pathlib  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
VOCAB_PATH = REPO / "model-repo" / "tiny-digits-vocab.txt"
_GOLD_CACHE = {}


def golden_family_state(family) -> AppState:
    if family not in _GOLD_CACHE:
        ckpt = REPO / "model-repo" / f"tiny-digits-{family}"
        vocab = Vocabulary.load(VOCAB_PATH)
        cfg = Config(model_family=family, audio_sec_buckets=[2.0],
                     batch_buckets=[1, 2], checkpoint_path=str(ckpt),
                     vocabulary_path=str(VOCAB_PATH))
        _, _, pipe = build_family_pipeline(family, "tiny", vocab, cfg)
        _GOLD_CACHE[family] = (pipe, vocab, cfg)
    pipe, vocab, cfg = _GOLD_CACHE[family]
    return AppState(pipe, vocab, cfg)


def _digits_pcm(words, noise=0.004, seed=7) -> bytes:
    from amira_rust_asr_server_tpu.testing import synth_digits
    wave = synth_digits(words, noise=noise,
                        rng=np.random.default_rng(seed))
    return (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()


@pytest.mark.slow
def test_family_hot_reload_http():
    """Random-weights CTC server + POST /v2/repository load of the
    committed family tree (canary-validated) => exact transcript. Also
    locks the index listing of bare orbax trees (no curated pointer)."""
    ckpt = REPO / "model-repo" / "tiny-digits-ctc"
    if not ckpt.exists():
        pytest.skip("tiny-digits-ctc checkpoint not present")
    vocab = Vocabulary.load(VOCAB_PATH)
    cfg = Config(model_family="ctc", audio_sec_buckets=[2.0],
                 batch_buckets=[1, 2], vocabulary_path=str(VOCAB_PATH),
                 model_repo_path=str(REPO / "model-repo"))
    _, _, pipe = build_family_pipeline("ctc", "tiny", vocab, cfg)
    state = AppState(pipe, vocab, cfg)

    async def go(client):
        resp = await client.post("/v2/repository/index")
        rows = (await resp.json())["models"]
        row = next(r for r in rows if r["name"] == "tiny-digits-ctc")
        assert row["state"] == "AVAILABLE"
        resp = await client.post(
            "/v2/repository/models/tiny-digits-ctc/load?validate=1")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "success" and body["validated"]
        pcm = _digits_pcm(["two", "five", "nine"])
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(pcm).decode()})
        body = await resp.json()
        assert body["transcription"] == "two five nine"
        resp = await client.post("/v2/repository/index")
        rows = (await resp.json())["models"]
        row = next(r for r in rows if r["name"] == "tiny-digits-ctc")
        assert row["state"] == "READY"
    run(with_client(state, go))


@pytest.mark.slow
@pytest.mark.parametrize("family", ["ctc", "aed"])
def test_family_golden_http_transcript(family):
    ckpt = REPO / "model-repo" / f"tiny-digits-{family}"
    if not ckpt.exists():
        pytest.skip(f"{ckpt.name} checkpoint not present")

    async def go(client):
        pcm = _digits_pcm(["two", "five", "nine"])
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(pcm).decode()})
        assert resp.status == 200
        body = await resp.json()
        assert body["transcription"] == "two five nine"
        if family == "ctc":
            # CTC's collapse carries per-token frame timestamps and
            # posteriors through to the wire (TokenInfo parity)
            det = body["metadata"].get("token_details")
            assert det and len(det) == 3
            times = [d["time_s"] for d in det]
            assert times == sorted(times)
            assert all(0.0 < d["confidence"] <= 1.0 for d in det)
    run(with_client(golden_family_state(family), go))
