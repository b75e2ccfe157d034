"""Beam search tests: scripted lattices + real tiny model, bias, n-best."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.beam import (backtrace, beam_decode,
                                                beam_decode_transducer,
                                                make_bias_vector)
from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
from amira_rust_asr_server_tpu.vocab import Vocabulary

BLANK = 3
VOCAB = 4  # tokens 0..2, blank=3


def fake_pred(tokens, state):
    out = tokens[:, None].astype(jnp.float32)
    return out, state


def run_beam(joint, enc, lens, k=4, s=3):
    trace = beam_decode(fake_pred, joint, enc, jnp.asarray(lens),
                        (jnp.zeros((1, enc.shape[0], 1)),), BLANK,
                        beam_width=k, max_expansions=s, vocab_size=VOCAB)
    return backtrace(trace, np.asarray(lens))


def test_peaked_lattice_matches_expected_sequence():
    """One confident token per frame -> beam returns exactly that path."""
    b, t = 1, 4
    frame_tokens = [0, 2, 1, 0]
    enc = jnp.asarray(np.array(frame_tokens, np.float32)[None, :, None])

    def joint(enc_frame, pred_out):
        want = enc_frame[:, 0].astype(jnp.int32)
        done = pred_out[:, 0].astype(jnp.int32) == want
        tgt = jnp.where(done, BLANK, want)
        return 20.0 * jax.nn.one_hot(tgt, VOCAB)

    res = run_beam(joint, enc, [t])
    assert res.counts[0] == 4
    assert res.tokens[0, :4].tolist() == frame_tokens


def test_beam_beats_greedy_on_garden_path():
    """Frame 0: token 0 slightly beats token 1, but token 0 leads to a
    forced low-probability continuation. Beam must pick token 1."""
    b, t = 1, 2
    enc = jnp.zeros((b, t, 1))
    log = jnp.log

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        # from SOS (last==BLANK): p(0)=0.5, p(1)=0.45, p(blank)=0.05
        sos_lp = jnp.asarray([log(0.5), log(0.45), log(1e-6), log(0.05)])
        # after token 0: terrible continuation p(blank)=0.01
        after0 = jnp.asarray([log(1e-6), log(0.98), log(1e-6), log(0.01)])
        # after token 1: clean p(blank)=0.95
        after1 = jnp.asarray([log(1e-6), log(1e-6), log(0.04), log(0.95)])
        table = jnp.stack([after0, after1, sos_lp, sos_lp])  # idx by last
        idx = jnp.clip(last, 0, 3)
        return table[idx]

    res = run_beam(joint, enc, [t], k=4, s=2)
    # greedy would emit 0 first; beam should prefer the path through 1
    assert res.tokens[0, 0] == 1
    assert res.counts[0] == 1
    # total: p(1|sos) * p(blank|1)^2, renormalized by each row's mass
    sos_mass = 0.5 + 0.45 + 1e-6 + 0.05
    a1_mass = 1e-6 + 1e-6 + 0.04 + 0.95
    want = np.log(0.45 / sos_mass) + 2 * np.log(0.95 / a1_mass)
    assert abs(res.scores[0] - want) < 1e-3


def test_ragged_lens_freeze_short_lane():
    b, t = 2, 5
    enc = jnp.asarray(
        np.tile(np.array([0, 1, 2, 0, 1], np.float32)[None, :, None],
                (b, 1, 1)))

    def joint(enc_frame, pred_out):
        want = enc_frame[:, 0].astype(jnp.int32)
        done = pred_out[:, 0].astype(jnp.int32) == want
        return 20.0 * jax.nn.one_hot(jnp.where(done, BLANK, want), VOCAB)

    res = run_beam(joint, enc, [5, 2])
    assert res.counts[0] == 5
    assert res.counts[1] == 2
    assert res.tokens[1, :2].tolist() == [0, 1]


# -- real model -------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    # blank-lean so sequences are sparse
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(1.8))
    return model, params


def _greedy_path_score(model, params, enc, res):
    """Log-prob of the greedy path along its own alignment."""
    cfg = model.config
    state = model.init_state(1)
    pred, state = model.predict_step(
        params, jnp.full((1,), cfg.blank_id, jnp.int32), state)
    score = 0.0
    count = int(res.counts[0])
    toks = np.asarray(res.tokens)[0, :count]
    frames = np.asarray(res.frame_idx)[0, :count]
    t_max = enc.shape[1]
    ptr = 0
    for t in range(t_max):
        while ptr < count and frames[ptr] == t:
            lp = jax.nn.log_softmax(
                model.joint_step(params, enc[:, t], pred))[0]
            score += float(lp[toks[ptr]])
            pred, state = model.predict_step(
                params, jnp.asarray([toks[ptr]], jnp.int32), state)
            ptr += 1
        lp = jax.nn.log_softmax(
            model.joint_step(params, enc[:, t], pred))[0]
        score += float(lp[cfg.blank_id])
    return score


@pytest.mark.slow
def test_beam_score_at_least_greedy(tiny):
    model, params = tiny
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((1, 6, model.config.d_enc)),
                      jnp.float32)
    lens = jnp.array([6])
    greedy = greedy_decode_transducer(model, params, enc, lens)
    g_score = _greedy_path_score(model, params, enc, greedy)
    beam = beam_decode_transducer(model, params, enc, lens, beam_width=8,
                                  max_expansions=4)
    assert beam.scores[0] >= g_score - 1e-3


@pytest.mark.slow
def test_bias_changes_output(tiny):
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(6)
    enc = jnp.asarray(rng.standard_normal((1, 5, cfg.d_enc)), jnp.float32)
    lens = jnp.array([5])
    base = beam_decode_transducer(model, params, enc, lens, beam_width=4)
    bias = jnp.zeros((cfg.vocab_size,)).at[7].set(6.0)
    biased = beam_decode_transducer(model, params, enc, lens, beam_width=4,
                                    bias=bias)
    assert (7 in biased.tokens[0, :biased.counts[0]].tolist()) or \
        biased.counts[0] != base.counts[0]


def test_nbest_ordered(tiny):
    model, params = tiny
    rng = np.random.default_rng(7)
    enc = jnp.asarray(rng.standard_normal((2, 5, model.config.d_enc)),
                      jnp.float32)
    res = beam_decode_transducer(model, params, enc, jnp.array([5, 5]),
                                 beam_width=4, n_best=3)
    assert res.n_best is not None
    for lane in res.n_best:
        scores = [s for s, _ in lane]
        assert scores == sorted(scores, reverse=True)


def test_make_bias_vector():
    vocab = Vocabulary.from_map({0: "▁he", 1: "llo", 2: "▁wor", 3: "ld",
                                 4: "▁cat"})
    bias = np.asarray(make_bias_vector(vocab, ["hello world"], 4.0, 8))
    assert bias[0] > 0 and bias[1] > 0 and bias[2] > 0 and bias[3] > 0
    assert bias[4] == 0
    assert bias[5:].sum() == 0


@pytest.mark.slow
def test_batched_beam_matches_single(tiny):
    """Beam over a 2-lane batch must equal per-utterance beam decodes."""
    import numpy as _np
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    model, params = tiny
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1, 2],
                 decoding_mode="beam", beam_width=4,
                 compute_dtype="float32")
    pipe = AsrPipeline(model, params, vocab, cfg)
    rng = _np.random.default_rng(9)
    w1 = (rng.standard_normal(4000) * 0.1).astype(_np.float32)
    w2 = (rng.standard_normal(6000) * 0.1).astype(_np.float32)

    solo1 = pipe.process_batch_samples(w1)
    solo2 = pipe.process_batch_samples(w2)
    res, fls, els = pipe.decode_beam_batch([w1, w2])
    from amira_rust_asr_server_tpu.ops.beam import BeamResult
    assert isinstance(res, BeamResult)
    t1 = [int(t) for t in res.tokens[0, :int(res.counts[0])]]
    t2 = [int(t) for t in res.tokens[1, :int(res.counts[1])]]
    assert t1 == solo1.tokens
    assert t2 == solo2.tokens


def test_beam_n_best_in_transcription(tiny):
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    model, params = tiny
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_width=4, beam_n_best=3,
                 compute_dtype="float32")
    pipe = AsrPipeline(model, params, vocab, cfg)
    import numpy as _np
    w = (_np.random.default_rng(10).standard_normal(4000) * 0.1
         ).astype(_np.float32)
    tr = pipe.process_batch_samples(w)
    assert tr.n_best is not None and len(tr.n_best) >= 1
    assert tr.n_best[0]["text"] == tr.text
    scores = [e["score"] for e in tr.n_best]
    assert scores == sorted(scores, reverse=True)


def test_beam_zero_length_lane():
    """A lane with enc_len=0 must yield an empty hypothesis, not garbage."""
    b, t = 2, 3
    enc = jnp.asarray(np.tile(np.array([0, 1, 2], np.float32)[None, :, None],
                              (b, 1, 1)))

    def joint(enc_frame, pred_out):
        want = enc_frame[:, 0].astype(jnp.int32)
        done = pred_out[:, 0].astype(jnp.int32) == want
        return 20.0 * jax.nn.one_hot(jnp.where(done, BLANK, want), VOCAB)

    res = run_beam(joint, enc, [3, 0])
    assert res.counts[0] == 3
    assert res.counts[1] == 0
