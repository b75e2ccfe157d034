"""Attention-decoder (AED) family: masks, loss semantics, end-to-end
memorize-and-decode.

Mirrors the CTC family's test strategy (tests/test_ctc_model.py): the
bar for a new head on the shared encoder is (a) provable mask
correctness — causality over decoder positions, encoder-pad invariance —
(b) teacher-forced loss that actually trains, and (c) greedy decode
reproducing trained sequences exactly, EOS-terminated.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amira_rust_asr_server_tpu.models import AEDModel
from amira_rust_asr_server_tpu.models.presets import TINY

pytestmark = pytest.mark.slow

CFG = dataclasses.replace(TINY)  # vocab 16, blank/EOS 15, d_enc 64


@pytest.fixture(scope="module")
def model():
    return AEDModel(CFG, dec_layers=2, dec_heads=2, d_dec=64)


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def _feats(rng, b=2, t=32):
    feats = jnp.asarray(rng.standard_normal((b, CFG.n_mels, t)) * 0.3,
                        jnp.float32)
    lens = jnp.asarray([t, t - 8][:b], jnp.int32)
    return feats, lens


def test_init_and_loss_finite(model, params):
    rng = np.random.default_rng(0)
    feats, lens = _feats(rng)
    labels = jnp.asarray(rng.integers(0, CFG.blank_id, (2, 5)), jnp.int32)
    label_lens = jnp.asarray([5, 3], jnp.int32)
    loss = jax.jit(model.loss)(params, feats, lens, labels, label_lens)
    assert np.isfinite(float(loss))
    # a random model's per-token CE should sit near ln(vocab)
    assert abs(float(loss) - np.log(CFG.vocab_size)) < 1.5


def test_decoder_is_causal(model, params):
    """Logits at position u must not depend on decoder inputs > u."""
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((1, 8, CFG.d_enc)), jnp.float32)
    enc_lens = jnp.asarray([8], jnp.int32)
    a = jnp.asarray([[15, 1, 2, 3, 4]], jnp.int32)
    b = jnp.asarray([[15, 1, 2, 9, 9]], jnp.int32)  # differs from pos 3
    la = model.decoder_logits(params, a, enc, enc_lens)
    lb = model.decoder_logits(params, b, enc, enc_lens)
    np.testing.assert_allclose(np.asarray(la[:, :3]), np.asarray(lb[:, :3]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(la[:, 3:]), np.asarray(lb[:, 3:]))


def test_encoder_pad_frames_are_masked(model, params):
    """Cross-attention must ignore encoder frames beyond enc_lens."""
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((1, 8, CFG.d_enc)), jnp.float32)
    enc_lens = jnp.asarray([5], jnp.int32)
    dec_in = jnp.asarray([[15, 1, 2]], jnp.int32)
    la = model.decoder_logits(params, dec_in, enc, enc_lens)
    enc2 = enc.at[:, 5:].set(99.0)   # garbage in the padded tail
    lb = model.decoder_logits(params, dec_in, enc2, enc_lens)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)


def test_loss_ignores_positions_past_label_len(model, params):
    rng = np.random.default_rng(3)
    feats, lens = _feats(rng)
    labels = jnp.asarray(rng.integers(0, CFG.blank_id, (2, 6)), jnp.int32)
    label_lens = jnp.asarray([4, 3], jnp.int32)
    l1 = model.loss(params, feats, lens, labels, label_lens)
    junk = labels.at[0, 5].set(9).at[1, 4].set(7)
    l2 = model.loss(params, feats, lens, junk, label_lens)
    # positions >= label_len are neither inputs (causal shift puts them
    # last) nor targets (valid mask) for the scored region... the final
    # input column CAN attend-shift; assert equality which holds because
    # masked target rows contribute 0 and inputs past len only feed rows
    # that are themselves masked
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_memorize_and_greedy_decode(model):
    """Two distinct utterances -> two distinct label sequences, trained
    to memorization; greedy decode must reproduce both, EOS-terminated."""
    rng = np.random.default_rng(4)
    feats, lens = _feats(rng, b=2, t=32)
    labels = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 0]], jnp.int32)
    label_lens = jnp.asarray([4, 3], jnp.int32)

    params = model.init(jax.random.PRNGKey(1))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(model.loss)(
            params, feats, lens, labels, label_lens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(400):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.01:
            break
    assert float(loss) < 0.05, f"did not memorize: loss={float(loss)}"

    toks, counts = jax.jit(
        lambda p, f, l: model.decode_greedy(p, f, l, max_len=8))(
            params, feats, lens)
    toks, counts = np.asarray(toks), np.asarray(counts)
    assert counts.tolist() == [4, 3]
    assert toks[0, :4].tolist() == [1, 2, 3, 4]
    assert toks[1, :3].tolist() == [5, 6, 7]


def test_kv_cached_decode_matches_uncached(model, params):
    """decode_greedy_cached must be token-identical to decode_greedy
    (the cache is exact under pre-LN causality, not an approximation) —
    on random params AND on a trained-like peaked model."""
    rng = np.random.default_rng(6)
    feats, lens = _feats(rng, b=2, t=32)
    t1, c1 = jax.jit(
        lambda p, f, l: model.decode_greedy(p, f, l, max_len=12))(
            params, feats, lens)
    t2, c2 = jax.jit(
        lambda p, f, l: model.decode_greedy_cached(p, f, l, max_len=12))(
            params, feats, lens)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_kv_cached_decode_matches_on_trained(model):
    """Same equality after memorization training (confident logits —
    the regime a real checkpoint decodes in)."""
    rng = np.random.default_rng(4)
    feats, lens = _feats(rng, b=2, t=32)
    labels = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 0]], jnp.int32)
    label_lens = jnp.asarray([4, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(1))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(model.loss)(
            params, feats, lens, labels, label_lens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(200):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.02:
            break
    t1, c1 = model.decode_greedy(params, feats, lens, max_len=8)
    t2, c2 = model.decode_greedy_cached(params, feats, lens, max_len=8)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_beam_width1_matches_greedy(model, params):
    rng = np.random.default_rng(8)
    feats, lens = _feats(rng, b=2, t=32)
    tg, cg = model.decode_greedy(params, feats, lens, max_len=10)
    tb, cb, _ = jax.jit(
        lambda p, f, l: model.decode_beam(p, f, l, width=1, max_len=10))(
            params, feats, lens)
    np.testing.assert_array_equal(np.asarray(cg), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tb))


def test_beam_score_dominates_greedy(model, params):
    """Beam explores a superset of greedy's path, so the best beam
    hypothesis' teacher-forced log-prob (incl. EOS) must be >= the
    greedy sequence's — the search-quality oracle, checked on random
    params where greedy is genuinely suboptimal."""
    rng = np.random.default_rng(9)
    feats, lens = _feats(rng, b=2, t=32)
    tg, cg = model.decode_greedy(params, feats, lens, max_len=10)
    tb, cb, sb = model.decode_beam(params, feats, lens, width=4,
                                   max_len=10)
    s_greedy = model.sequence_scores(params, feats, lens, tg, cg)
    s_beam = model.sequence_scores(params, feats, lens, tb, cb)
    # reported beam score must BE the teacher-forced score of its output
    np.testing.assert_allclose(np.asarray(sb), np.asarray(s_beam),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(s_beam) >= np.asarray(s_greedy) - 1e-4)


def test_beam_return_all_is_ranked_superset(model, params):
    rng = np.random.default_rng(10)
    feats, lens = _feats(rng, b=2, t=32)
    tb, cb, sb = model.decode_beam(params, feats, lens, width=4,
                                   max_len=8)
    ta, ca, sa = model.decode_beam(params, feats, lens, width=4,
                                   max_len=8, return_all=True)
    assert ta.shape == (2, 4, 8) and sa.shape == (2, 4)
    # rank 0 == the best-only return; scores sorted descending
    np.testing.assert_array_equal(np.asarray(ta[:, 0]), np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(ca[:, 0]), np.asarray(cb))
    np.testing.assert_allclose(np.asarray(sa[:, 0]), np.asarray(sb))
    s = np.asarray(sa)
    assert np.all(s[:, :-1] >= s[:, 1:] - 1e-6)


def test_beam_on_trained_returns_memorized(model):
    rng = np.random.default_rng(4)
    feats, lens = _feats(rng, b=2, t=32)
    labels = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 0]], jnp.int32)
    label_lens = jnp.asarray([4, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(1))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(model.loss)(
            params, feats, lens, labels, label_lens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.02:
            break
    toks, counts, scores = model.decode_beam(params, feats, lens,
                                             width=4, max_len=8)
    toks, counts = np.asarray(toks), np.asarray(counts)
    assert counts.tolist() == [4, 3]
    assert toks[0, :4].tolist() == [1, 2, 3, 4]
    assert toks[1, :3].tolist() == [5, 6, 7]
    assert np.all(np.asarray(scores) > -1.0)  # confident after training


def test_checkpoint_roundtrip(model, params, tmp_path):
    path = str(tmp_path / "aed-ckpt")
    model.save_checkpoint(path, params)
    loaded = model.load_checkpoint(path, like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aed_train_step_tp_sharded_matches_unsharded(model):
    """aed_loss_fn rides the same structural shardings as the other
    families: sharded train-step loss == single-device loss."""
    from amira_rust_asr_server_tpu.parallel import (TrainBatch, aed_loss_fn,
                                                    init_training, make_mesh,
                                                    make_optimizer,
                                                    make_train_step)
    rng = np.random.default_rng(7)
    b, n, u = 2, 3200, 4
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32),
        audio_lens=jnp.asarray([n, n - 800], jnp.int32),
        labels=jnp.asarray(rng.integers(0, CFG.blank_id, (b, u)), jnp.int32),
        label_lens=jnp.asarray([u, 2], jnp.int32))
    optimizer = make_optimizer(lr=1e-3)
    p0, o0 = init_training(model, jax.random.PRNGKey(1), optimizer)
    _, _, loss_single = make_train_step(
        model, optimizer, loss=aed_loss_fn)(p0, o0, batch)
    mesh = make_mesh({"data": 2, "model": 4})
    p, o = init_training(model, jax.random.PRNGKey(1), optimizer, mesh)
    step = make_train_step(model, optimizer, mesh, loss=aed_loss_fn)(p, o)
    _, _, loss_sharded = step(p, o, batch)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=2e-4)


def test_encoder_params_interchangeable_with_transducer(model, params):
    """The AED encoder pytree slots into a Transducer (shared-contract
    claim: one encoder, three heads)."""
    from amira_rust_asr_server_tpu.models import Transducer
    td = Transducer(CFG)
    tparams = td.init(jax.random.PRNGKey(0))
    tparams = dict(tparams)
    tparams["encoder"] = params["encoder"]
    rng = np.random.default_rng(5)
    feats, lens = _feats(rng)
    e1, l1 = model.encode(params, feats, lens)
    e2, l2 = td.encode(tparams, feats, lens)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-6, atol=1e-6)
