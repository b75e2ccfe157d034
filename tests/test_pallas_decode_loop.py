"""Whole-decode-loop Pallas kernel vs the XLA greedy loop (interpret mode;
the on-hardware check lives in tools/tpu_selfcheck.py).

In f32 the kernel's math is operation-for-operation the XLA path's, so
token sequences, frame indices, counts and carried state must match
exactly — including the scripted edge semantics the XLA loop is locked to
(max_symbols forced advance, max_total session budget, carry resume).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
from amira_rust_asr_server_tpu.ops.pallas.decode_loop import \
    greedy_loop_pallas


@pytest.fixture(scope="module")
def tiny():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(1.5))
    return model, params


def run_pallas(model, params, enc, enc_lens, *, carry=None,
               max_symbols=30, max_total=200, lookahead=8,
               token_offset=None):
    cfg = model.config
    b = enc.shape[0]
    enc_pre = model.joint_precompute_enc(params, enc)
    if carry is None:
        h0, c0 = model.init_state(b, enc.dtype)
        pred0, (h0, c0) = model.predict_step(
            params, jnp.full((b,), cfg.blank_id, jnp.int32), (h0, c0))
        last0 = jnp.full((b,), cfg.blank_id, jnp.int32)
    else:
        (h0, c0), pred0, last0 = carry.state, carry.pred_out, \
            carry.last_token
    if token_offset is None:
        token_offset = jnp.zeros((b,), jnp.int32)
    return greedy_loop_pallas(
        enc_pre, enc_lens, h0, c0, pred0, last0, token_offset,
        params["predictor"], params["joint"], blank_id=cfg.blank_id,
        max_symbols=max_symbols, max_total=max_total, lookahead=lookahead,
        interpret=True)


def assert_matches(pall, ref):
    tokens, counts, frames, confs, (h, c), pred_out, last = pall
    counts = np.asarray(counts)
    ref_counts = np.asarray(ref.counts)
    np.testing.assert_array_equal(counts, ref_counts)
    for i in range(counts.shape[0]):
        n = int(counts[i])
        np.testing.assert_array_equal(np.asarray(tokens)[i, :n],
                                      np.asarray(ref.tokens)[i, :n])
        np.testing.assert_array_equal(np.asarray(frames)[i, :n],
                                      np.asarray(ref.frame_idx)[i, :n])
        np.testing.assert_allclose(np.asarray(confs)[i, :n],
                                   np.asarray(ref.confidence)[i, :n],
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(last), np.asarray(
        ref.last_token))
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref.state[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_out),
                               np.asarray(ref.pred_out),
                               rtol=2e-4, atol=2e-5)


def test_matches_xla_loop_random_batch(tiny):
    model, params = tiny
    rng = np.random.default_rng(0)
    b, t = 4, 21
    enc = jnp.asarray(rng.standard_normal((b, t, model.config.d_enc)),
                      jnp.float32)
    lens = jnp.asarray([21, 13, 1, 7], jnp.int32)
    ref = greedy_decode_transducer(model, params, enc, lens, lookahead=8)
    pall = run_pallas(model, params, enc, lens)
    assert_matches(pall, ref)


def test_matches_with_max_symbols_pressure(tiny):
    """Emission-happy joint: the per-frame cap's forced advance and the
    max_total budget must bind identically."""
    model, params = tiny
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(-4.0))
    rng = np.random.default_rng(1)
    b, t = 3, 9
    enc = jnp.asarray(rng.standard_normal((b, t, model.config.d_enc)),
                      jnp.float32)
    lens = jnp.asarray([9, 9, 5], jnp.int32)
    ref = greedy_decode_transducer(model, params, enc, lens,
                                   max_symbols=3, max_total=20, lookahead=4)
    pall = run_pallas(model, params, enc, lens, max_symbols=3,
                      max_total=20, lookahead=4)
    assert_matches(pall, ref)


def test_carry_resume_matches(tiny):
    """Chunk 1 -> carry -> chunk 2 must equal the XLA path including the
    session-wide max_total accounting."""
    model, params = tiny
    rng = np.random.default_rng(2)
    b, t = 2, 10
    enc1 = jnp.asarray(rng.standard_normal((b, t, model.config.d_enc)),
                       jnp.float32)
    enc2 = jnp.asarray(rng.standard_normal((b, t, model.config.d_enc)),
                       jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)

    ref1 = greedy_decode_transducer(model, params, enc1, lens)
    ref2 = greedy_decode_transducer(model, params, enc2, lens, carry=ref1)

    p1 = run_pallas(model, params, enc1, lens)
    tokens, counts, frames, confs, state, pred_out, last = p1

    class Carry:
        pass

    carry = Carry()
    carry.state = state
    carry.pred_out = pred_out
    carry.last_token = last
    p2 = run_pallas(model, params, enc2, lens, carry=carry,
                    token_offset=jnp.asarray(counts))
    assert_matches(p1, ref1)
    assert_matches(p2, ref2)


def test_single_lane_and_short_sequence(tiny):
    model, params = tiny
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((1, 3, model.config.d_enc)),
                      jnp.float32)
    lens = jnp.asarray([3], jnp.int32)
    ref = greedy_decode_transducer(model, params, enc, lens, lookahead=8)
    pall = run_pallas(model, params, enc, lens, lookahead=8)
    assert_matches(pall, ref)


# ---------------------------------------------------------------------------
# int8-resident LSTM weights (W8A8 in-kernel; config.int8_decode_weights)
# ---------------------------------------------------------------------------

def test_quantize_pred_lstm_roundtrip(tiny):
    """Per-output-channel symmetric quant: dequant error <= scale/2."""
    from amira_rust_asr_server_tpu.ops.pallas.decode_loop import \
        quantize_pred_lstm
    model, params = tiny
    pq = quantize_pred_lstm(params["predictor"])
    for li, layer in enumerate(params["predictor"]["lstm"]):
        w = np.asarray(layer["w"], np.float32)
        d_p = w.shape[1] // 4
        d_x = w.shape[0] - d_p
        for tag, part in (("x", w[:d_x]), ("h", w[d_x:])):
            q = np.asarray(pq[f"w{tag}{li}_q"], np.int32)
            s = np.asarray(pq[f"s{tag}{li}"], np.float32)
            assert q.min() >= -127 and q.max() <= 127
            err = np.abs(part - q * s[None, :])
            assert np.all(err <= s[None, :] * 0.5 + 1e-9)


@pytest.mark.slow
def test_quant_kernel_tokens_match_f32_on_trained_checkpoint():
    """On a TRAINED checkpoint (realistic logit margins) the int8-resident
    kernel must produce token-identical transcripts to the f32 XLA loop.

    Random-weight logit margins are razor-thin, so token equality is only
    a meaningful contract on trained weights — the same reasoning as the
    golden e2e tests (tests/test_golden_e2e.py)."""
    import pathlib

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

    rng = np.random.default_rng(11)
    utts = [["three", "five", "zero"], ["eight"],
            ["one", "two", "nine", "four"], ["seven", "six"]]
    b, n = len(utts), 32000
    audio = np.zeros((b, n), np.float32)
    lens = np.zeros((b,), np.int32)
    for i, words in enumerate(utts):
        w = synth_digits(words, noise=0.004, rng=rng)
        audio[i, :len(w)] = w[:n]
        lens[i] = min(len(w), n)
    feats, fl = log_mel_features(jnp.asarray(audio), jnp.asarray(lens),
                                 n_mels=cfg.n_mels)
    enc, el = model.encode(params, feats, fl)

    ref = greedy_decode_transducer(model, params, enc, el)

    enc_pre = model.joint_precompute_enc(params, enc)
    h0, c0 = model.init_state(b, enc.dtype)
    pred0, (h0, c0) = model.predict_step(
        params, jnp.full((b,), cfg.blank_id, jnp.int32), (h0, c0))
    pq = quantize_pred_lstm(params["predictor"])
    tokens, counts, frames, confs, _, _, _ = greedy_loop_pallas(
        enc_pre, el, h0, c0, pred0,
        jnp.full((b,), cfg.blank_id, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        params["predictor"], params["joint"], pq,
        blank_id=cfg.blank_id, max_symbols=30, max_total=200,
        lookahead=8, interpret=True)

    counts = np.asarray(counts)
    np.testing.assert_array_equal(counts, np.asarray(ref.counts))
    for i in range(b):
        k = int(counts[i])
        np.testing.assert_array_equal(
            np.asarray(tokens)[i, :k], np.asarray(ref.tokens)[i, :k])
        np.testing.assert_array_equal(
            np.asarray(frames)[i, :k], np.asarray(ref.frame_idx)[i, :k])
