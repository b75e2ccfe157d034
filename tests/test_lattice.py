"""Beam lattice outputs: timed n-best, prefix-DAG merge, serving surface.

The lattice is a parity-plus capability (the reference's k2 backend
builds FsaVec lattices internally but ships 1-best text only —
k2_decoder_backend.cc:63-253); these tests lock (a) the timed traversal
to ops.beam.backtrace so the two walks cannot drift, (b) the DAG merge
to be lossless (paths() round-trips), and (c) the HTTP wire surface.
"""

import asyncio
import base64

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.beam import backtrace, beam_decode
from amira_rust_asr_server_tpu.ops.lattice import (Lattice,
                                                   decode_beam_lattice,
                                                   lattice_from_timed,
                                                   lattice_from_trace,
                                                   timed_nbest)
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.server import AppState, create_app
from amira_rust_asr_server_tpu.vocab import Vocabulary

BLANK = 3
VOCAB = 4


def fake_pred(tokens, state):
    out = tokens[:, None].astype(jnp.float32)
    return out, state


def ambiguous_trace(t=3, k=4, s=2):
    """Flat-ish distribution every frame -> several surviving paths."""
    enc = jnp.zeros((1, t, 1))

    def joint(enc_frame, pred_out):
        lp = jnp.log(jnp.asarray([0.4, 0.3, 1e-6, 0.3]))
        return jnp.tile(lp[None, :], (pred_out.shape[0], 1))

    trace = beam_decode(fake_pred, joint, enc, jnp.asarray([t]),
                        (jnp.zeros((1, 1, 1)),), BLANK,
                        beam_width=k, max_expansions=s, vocab_size=VOCAB)
    return trace, np.asarray([t])


def test_timed_nbest_matches_backtrace():
    trace, lens = ambiguous_trace()
    res = backtrace(trace, lens, n_best=4)
    timed = timed_nbest(trace, lens, n_best=4)
    assert len(timed[0]) == len(res.n_best[0]) >= 2
    for (score_t, seq_t), (score_b, seq_b) in zip(timed[0], res.n_best[0]):
        assert score_t == pytest.approx(score_b)
        assert [tok for tok, _ in seq_t] == seq_b
        frames = [f for _, f in seq_t]
        assert frames == sorted(frames)          # emission order
        assert all(0 <= f < lens[0] for f in frames)


def test_lattice_roundtrip_paths():
    trace, lens = ambiguous_trace()
    timed = timed_nbest(trace, lens, n_best=4)
    lat = lattice_from_trace(trace, lens, n_best=4)[0]
    want = {(round(s, 4), tuple(seq)) for s, seq in timed[0]}
    got = {(round(s, 4), tuple(seq)) for s, seq in lat.paths()}
    assert got == want


def test_lattice_prefix_merge_shares_nodes():
    paths = [(-1.0, [(0, 0), (1, 1), (2, 2)]),
             (-2.0, [(0, 0), (1, 1), (1, 2)]),
             (-3.0, [(2, 0)])]
    lat = lattice_from_timed(paths)
    # 7 tokens total but (0,0)->(1,1) prefix is shared: 5 arcs, 6 nodes
    assert len(lat.arcs) == 5
    assert lat.n_nodes == 6
    assert lat.arcs[0] == (0, 1, 0, 0)           # shared first arc
    # finals ranked best-first and carry exact path scores
    assert [s for _, s in lat.finals] == [-1.0, -2.0, -3.0]
    got = {(s, tuple(seq)) for s, seq in lat.paths()}
    assert got == {(s, tuple(seq)) for s, seq in paths}


def test_lattice_identical_paths_collapse():
    paths = [(-1.0, [(0, 0)]), (-2.0, [(0, 0)])]
    lat = lattice_from_timed(paths)
    assert len(lat.finals) == 1 and lat.finals[0][1] == -1.0


def test_lattice_to_dict_surface():
    trace, lens = ambiguous_trace()
    lat = lattice_from_trace(trace, lens, n_best=4)[0]
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(VOCAB)})
    d = lat.to_dict(vocab=vocab, sec_per_frame=0.04)
    assert d["n_nodes"] == lat.n_nodes
    assert len(d["arc_times_s"]) == len(d["arcs"])
    for (src, dst, tok, frame), t_s in zip(d["arcs"], d["arc_times_s"]):
        assert t_s == pytest.approx(frame * 0.04, abs=1e-3)
        assert str(tok) in d["pieces"]


# ---------------------------------------------------------------------------
def _pipeline(decoding_mode="beam"):
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 max_symbols_per_step=5, max_total_tokens=50,
                 decoding_mode=decoding_mode, beam_width=4)
    return AsrPipeline(model, params, vocab, cfg), vocab, cfg


def test_decode_beam_lattice_matches_pipeline():
    pipe, _, _ = _pipeline()
    rng = np.random.default_rng(0)
    samples = (rng.integers(-3000, 3000, 3200).astype(np.float32)
               / 32768.0)
    ref, feat_ref, enc_ref = pipe.decode_beam_batch([samples], n_best=4)
    res, lattices, feat_lens, enc_lens = decode_beam_lattice(
        pipe, [samples], n_best=4)
    # same jitted program, same packing -> identical decode
    np.testing.assert_array_equal(res.tokens, ref.tokens)
    np.testing.assert_array_equal(res.counts, ref.counts)
    assert feat_lens == feat_ref and enc_lens == enc_ref
    assert len(lattices) == 1 and isinstance(lattices[0], Lattice)
    best_score, best_seq = lattices[0].paths()[0]
    assert [tok for tok, _ in best_seq] == \
        [int(t) for t in ref.tokens[0, :int(ref.counts[0])]]
    assert best_score == pytest.approx(float(ref.scores[0]))


# ---------------------------------------------------------------------------
def _post_batch(state, body):
    async def go():
        app = create_app(state)
        async with TestClient(TestServer(app)) as client:
            resp = await client.post("/v2/decode/batch/m", json=body)
            return resp.status, await resp.json()
    return asyncio.run(go())


def _audio_body(**extra):
    rng = np.random.default_rng(1)
    pcm = rng.integers(-3000, 3000, 3200, dtype=np.int16).tobytes()
    body = {"audio_buffer": base64.b64encode(pcm).decode()}
    body.update(extra)
    return body


def test_server_lattice_metadata():
    pipe, vocab, cfg = _pipeline()
    state = AppState(pipe, vocab, cfg)
    status, js = _post_batch(state, _audio_body(lattice=True, n_best=4))
    assert status == 200, js
    lat = js["metadata"]["lattice"]
    assert set(lat) >= {"n_nodes", "arcs", "finals", "arc_times_s",
                        "pieces"}
    # best final's path tokens must spell the 1-best transcription
    best = js["metadata"]["tokens"]
    parent = {dst: (src, tok) for src, dst, tok, _ in lat["arcs"]}
    node = lat["finals"][0][0]
    seq = []
    while node != 0:
        node, tok = parent[node][0], parent[node][1]
        seq.append(tok)
    assert list(reversed(seq)) == best
    # n_best alternatives ride along (beam_width=4 -> >=1 entries)
    assert js["metadata"].get("n_best")


def test_server_lattice_requires_beam_mode():
    pipe, vocab, cfg = _pipeline(decoding_mode="greedy")
    state = AppState(pipe, vocab, cfg)
    status, js = _post_batch(state, _audio_body(lattice=True))
    assert status == 400
    assert "beam" in js["message"]


def test_server_lattice_fuzzed_n_best():
    """Garbage / extreme n_best values: strings -> 400, huge/negative
    ints clamp to [1, beam_width] and still serve. All requests ride one
    event loop (AppState asyncio primitives bind to the first loop)."""
    pipe, vocab, cfg = _pipeline()
    state = AppState(pipe, vocab, cfg)

    async def go():
        app = create_app(state)
        out = []
        async with TestClient(TestServer(app)) as client:
            for n_best in ("abc", 10**9, -5, 0):
                resp = await client.post(
                    "/v2/decode/batch/m",
                    json=_audio_body(lattice=True, n_best=n_best))
                out.append((resp.status, await resp.json()))
        return out

    results = asyncio.run(go())
    status, js = results[0]
    assert status == 400 and "n_best" in js["message"]
    for status, js in results[1:]:
        assert status == 200, js
        assert 1 <= len(js["metadata"]["lattice"]["finals"]) <= \
            cfg.beam_width
