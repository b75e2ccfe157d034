"""Greedy RNN-T decode loop tests with scripted joint/pred functions —
the same injectable-seam strategy the reference uses (mock decode_fn,
ref: src/asr/decoder_optimized.rs:331-366)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.greedy import (greedy_decode,
                                                  greedy_decode_transducer)

BLANK = 4
VOCAB = 5  # tokens 0..3 + blank=4


def fake_pred(tokens, state):
    """pred_out carries the last consumed token (as one-hot-ish float)."""
    out = tokens[:, None].astype(jnp.float32)  # [B, 1]
    return out, jax.tree_util.tree_map(lambda s: s + 1, state)


def one_symbol_per_frame_joint(enc_frame, pred_out):
    """Emit token enc_frame[:,0] once per frame: blank iff the last consumed
    token already equals this frame's token."""
    want = enc_frame[:, 0].astype(jnp.int32)
    emitted = pred_out[:, 0].astype(jnp.int32) == want
    logits = jax.nn.one_hot(jnp.where(emitted, BLANK, want), VOCAB)
    return logits


def zero_state(b):
    return (jnp.zeros((1, b, 1)),)


def test_all_blank_emits_nothing():
    b, t = 3, 6
    enc = jnp.zeros((b, t, 2))
    joint = lambda e, p: jax.nn.one_hot(
        jnp.full((e.shape[0],), BLANK), VOCAB)
    res = greedy_decode(fake_pred, joint, enc, jnp.full((b,), t),
                        zero_state(b), BLANK)
    np.testing.assert_array_equal(np.asarray(res.counts), [0, 0, 0])


def test_one_symbol_per_frame_and_ragged_lens():
    b, t = 2, 6
    # frame tokens alternate 0,1,2,3,0,1 so consecutive frames differ
    frame_tokens = np.arange(t) % 4
    enc = np.tile(frame_tokens[None, :, None], (b, 1, 2)).astype(np.float32)
    lens = jnp.array([6, 3])
    res = greedy_decode(fake_pred, one_symbol_per_frame_joint,
                        jnp.asarray(enc), lens, zero_state(b), BLANK)
    counts = np.asarray(res.counts)
    np.testing.assert_array_equal(counts, [6, 3])
    np.testing.assert_array_equal(
        np.asarray(res.tokens)[0, :6], frame_tokens)
    np.testing.assert_array_equal(
        np.asarray(res.tokens)[1, :3], frame_tokens[:3])
    np.testing.assert_array_equal(np.asarray(res.frame_idx)[0, :6],
                                  np.arange(6))
    # last_token reflects the final emission per lane
    np.testing.assert_array_equal(np.asarray(res.last_token), [1, 2])


def test_max_symbols_forces_frame_advance():
    """A joint that always emits must be capped at max_symbols per frame
    (ref: constants.rs MAX_SYMBOLS_PER_STEP=30, here 3)."""
    b, t = 1, 4
    enc = jnp.zeros((b, t, 2))
    always_2 = lambda e, p: jax.nn.one_hot(
        jnp.full((e.shape[0],), 2), VOCAB)
    res = greedy_decode(fake_pred, always_2, enc, jnp.array([t]),
                        zero_state(b), BLANK, max_symbols=3, max_total=100)
    assert int(res.counts[0]) == 3 * t
    assert (np.asarray(res.tokens)[0, :12] == 2).all()
    # 3 symbols recorded on each frame
    np.testing.assert_array_equal(np.asarray(res.frame_idx)[0, :12],
                                  np.repeat(np.arange(4), 3))


def test_max_total_tokens_cap():
    b, t = 1, 100
    enc = jnp.zeros((b, t, 2))
    always_1 = lambda e, p: jax.nn.one_hot(
        jnp.full((e.shape[0],), 1), VOCAB)
    res = greedy_decode(fake_pred, always_1, enc, jnp.array([t]),
                        zero_state(b), BLANK, max_symbols=5, max_total=7)
    assert int(res.counts[0]) == 7


def test_loop_is_jittable():
    b, t = 2, 5
    enc = jnp.zeros((b, t, 2))
    joint = lambda e, p: jax.nn.one_hot(
        jnp.full((e.shape[0],), BLANK), VOCAB)

    @jax.jit
    def run(enc, lens):
        return greedy_decode(fake_pred, joint, enc, lens,
                             zero_state(b), BLANK)

    res = run(enc, jnp.full((b,), t))
    assert int(res.counts.sum()) == 0


# -- real-model integration -------------------------------------------------
@pytest.fixture(scope="module")
def tiny():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_transducer_greedy_smoke_and_determinism(tiny):
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(3)
    b, t = 2, 12
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_enc)), jnp.float32)
    lens = jnp.array([12, 8])
    r1 = greedy_decode_transducer(model, params, enc, lens)
    r2 = greedy_decode_transducer(model, params, enc, lens)
    np.testing.assert_array_equal(np.asarray(r1.tokens),
                                  np.asarray(r2.tokens))
    counts = np.asarray(r1.counts)
    assert (counts >= 0).all()
    toks = np.asarray(r1.tokens)
    for i, c in enumerate(counts):
        emitted = toks[i, :c]
        assert ((emitted >= 0) & (emitted < cfg.vocab_size)).all()
        assert (emitted != cfg.blank_id).all()


def test_streaming_carry_equivalence(tiny):
    """Decoding [0:T] must equal decoding [0:T/2] then [T/2:T] with carried
    prediction-net state — the HBM-resident streaming contract
    (ref analogue: carried DecoderState, src/asr/incremental.rs:51,143)."""
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(4)
    b, t = 1, 16
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_enc)), jnp.float32)

    # bias the joint toward blank so random weights emit sparsely and the
    # max_total cap (which resets per call) never binds
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(1.8))

    full = greedy_decode_transducer(model, params, enc, jnp.array([t]))
    assert 0 < int(full.counts[0]) < 100  # sparse but nonempty (43 @ seed 4)

    h = t // 2
    first = greedy_decode_transducer(model, params, enc[:, :h],
                                     jnp.array([h]))
    second = greedy_decode_transducer(model, params, enc[:, h:],
                                      jnp.array([t - h]), carry=first)

    c_full = int(full.counts[0])
    c1, c2 = int(first.counts[0]), int(second.counts[0])
    assert c_full == c1 + c2
    merged = np.concatenate([np.asarray(first.tokens)[0, :c1],
                             np.asarray(second.tokens)[0, :c2]])
    np.testing.assert_array_equal(np.asarray(full.tokens)[0, :c_full],
                                  merged)


def test_lookahead_equivalence(tiny):
    """lookahead=1 (classic label-looping) and lookahead=8 (blank-run
    skipping) must produce identical results — the lookahead only changes
    how many frames are *checked* per iteration, not any decision."""
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(11)
    b, t = 3, 20
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_enc)), jnp.float32)
    lens = jnp.array([20, 13, 7])
    r1 = greedy_decode_transducer(model, params, enc, lens, lookahead=1)
    r8 = greedy_decode_transducer(model, params, enc, lens, lookahead=8)
    np.testing.assert_array_equal(np.asarray(r1.counts),
                                  np.asarray(r8.counts))
    np.testing.assert_array_equal(np.asarray(r1.tokens),
                                  np.asarray(r8.tokens))
    np.testing.assert_array_equal(np.asarray(r1.frame_idx),
                                  np.asarray(r8.frame_idx))
    np.testing.assert_allclose(np.asarray(r1.confidence),
                               np.asarray(r8.confidence), atol=1e-5)


def test_greedy_zero_length_lane(tiny):
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(12)
    enc = jnp.asarray(rng.standard_normal((2, 6, cfg.d_enc)), jnp.float32)
    res = greedy_decode_transducer(model, params, enc, jnp.array([6, 0]))
    assert int(res.counts[1]) == 0
    # zero-length lane's carry state remains the fresh SOS state
    assert int(res.last_token[1]) == cfg.blank_id
