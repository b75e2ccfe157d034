"""CTC loss / greedy decode (ops/ctc.py) and the CTC model family
(models/ctc.py).

The loss is adversarially oracle-tested against torch.nn.functional.
ctc_loss — values AND gradients — across repeated labels (skip-rule
exercise), zero-length labels, full/short frame lengths, and L=0 static
shapes. Greedy decode is checked against a literal numpy collapse.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amira_rust_asr_server_tpu.models import CTCModel
from amira_rust_asr_server_tpu.ops.ctc import ctc_greedy_decode, ctc_loss

BLANK = 6
V = 7


def _torch_ref(logits, log_lens, labels, lab_lens, blank, want_grad=False):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    tl = torch.tensor(logits, requires_grad=want_grad)
    tlp = F.log_softmax(tl, dim=-1).transpose(0, 1)  # [T, B, V]
    flat = np.concatenate(
        [labels[i, :lab_lens[i]] for i in range(len(lab_lens))]
    ).astype(np.int64) if lab_lens.sum() else np.zeros(0, np.int64)
    ref = F.ctc_loss(tlp, torch.tensor(flat), torch.tensor(log_lens),
                     torch.tensor(lab_lens), blank=blank,
                     reduction="none", zero_infinity=False)
    if not want_grad:
        return ref.detach().numpy(), None
    ref.sum().backward()
    return ref.detach().numpy(), tl.grad.numpy()


def _mine(logits, log_lens, labels, lab_lens, blank):
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return np.asarray(ctc_loss(lp, jnp.asarray(log_lens),
                               jnp.asarray(labels), jnp.asarray(lab_lens),
                               blank))


def test_loss_matches_torch_oracle():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 12, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, (4, 5)).astype(np.int32)
    labels[1, 1] = labels[1, 0]          # repeated label: skip forbidden
    lab_lens = np.array([5, 4, 0, 2], np.int32)
    log_lens = np.array([12, 9, 7, 5], np.int32)
    ref, _ = _torch_ref(logits, log_lens, labels, lab_lens, BLANK)
    np.testing.assert_allclose(
        _mine(logits, log_lens, labels, lab_lens, BLANK), ref,
        rtol=1e-5, atol=1e-5)


def test_loss_gradients_match_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((3, 10, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, (3, 4)).astype(np.int32)
    lab_lens = np.array([4, 1, 3], np.int32)
    log_lens = np.array([10, 6, 8], np.int32)
    ref, g_ref = _torch_ref(logits, log_lens, labels, lab_lens, BLANK,
                            want_grad=True)

    def loss_sum(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(log_lens), jnp.asarray(labels),
                        jnp.asarray(lab_lens), BLANK).sum()

    g_mine = np.asarray(jax.grad(loss_sum)(jnp.asarray(logits)))
    np.testing.assert_allclose(g_mine, g_ref, rtol=1e-4, atol=1e-5)


def test_loss_all_blank_and_static_l0():
    """label_len=0 must equal the all-blank path probability, including
    when the labels array is statically zero-width."""
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 6, V)).astype(np.float32)
    log_lens = np.array([6, 4], np.int32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    expect = np.array([-lp[i, :log_lens[i], BLANK].sum() for i in range(2)])

    for l_shape in (3, 0):
        labels = np.zeros((2, l_shape), np.int32)
        lab_lens = np.zeros(2, np.int32)
        got = _mine(logits, log_lens, labels, lab_lens, BLANK)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_loss_impossible_alignment_is_huge():
    """More labels than frames -> no path; loss ~ -NEG_INF scale, finite."""
    logits = np.zeros((1, 2, V), np.float32)
    labels = np.array([[0, 1, 2]], np.int32)
    got = _mine(logits, np.array([2], np.int32), labels,
                np.array([3], np.int32), BLANK)
    assert np.isfinite(got[0]) and got[0] > 1e20


def test_loss_jits_and_batches_agree():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((5, 9, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, (5, 3)).astype(np.int32)
    lab_lens = np.array([3, 2, 1, 3, 0], np.int32)
    log_lens = np.array([9, 9, 5, 7, 9], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    f = jax.jit(lambda *a: ctc_loss(*a, BLANK))
    batched = np.asarray(f(lp, jnp.asarray(log_lens), jnp.asarray(labels),
                           jnp.asarray(lab_lens)))
    for i in range(5):
        single = _mine(logits[i:i + 1], log_lens[i:i + 1],
                       labels[i:i + 1], lab_lens[i:i + 1], BLANK)
        np.testing.assert_allclose(batched[i], single[0], rtol=1e-5,
                                   atol=1e-5)


def test_greedy_decode_matches_numpy_collapse():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((6, 14, V)).astype(np.float32)
    log_lens = np.array([14, 10, 1, 5, 0, 14], np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    toks, counts = jax.jit(
        lambda a, b: ctc_greedy_decode(a, b, BLANK))(lp, jnp.asarray(log_lens))
    toks, counts = np.asarray(toks), np.asarray(counts)
    for i in range(6):
        path = np.argmax(logits[i, :log_lens[i]], axis=-1)
        out, prev = [], BLANK
        for p in path:
            if p != BLANK and p != prev:
                out.append(int(p))
            prev = p
        assert counts[i] == len(out)
        assert list(toks[i, :counts[i]]) == out
        assert (toks[i, counts[i]:] == BLANK).all()  # blank-padded tail


def test_ctc_model_shapes_and_decode():
    model = CTCModel.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    cfg = model.config
    b, t = 2, 64
    feats = jnp.asarray(
        np.random.default_rng(5).standard_normal((b, cfg.n_mels, t)) * 0.1,
        jnp.float32)
    lens = jnp.array([t, t // 2], jnp.int32)
    enc, enc_lens = model.encode(params, feats, lens)
    assert enc.shape[0] == b and enc.shape[2] == cfg.d_enc
    logits = model.logits(params, enc)
    assert logits.shape == (*enc.shape[:2], cfg.vocab_size)
    toks, counts = jax.jit(model.decode_greedy)(params, feats, lens)
    assert toks.shape == (b, enc.shape[1]) and counts.shape == (b,)
    assert (np.asarray(counts) <= np.asarray(enc_lens)).all()


@pytest.mark.slow
def test_ctc_tiny_learns_a_pattern():
    """Few-step train smoke: loss on a fixed batch drops substantially and
    greedy decode recovers the target labels."""
    import optax

    model = CTCModel.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    cfg = model.config
    rng = np.random.default_rng(6)
    b, t = 4, 128
    feats = jnp.asarray(rng.standard_normal((b, cfg.n_mels, t)) * 0.3,
                        jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg.blank_id, (b, 3)), jnp.int32)
    lab_lens = jnp.full((b,), 3, jnp.int32)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(model.loss)(
            params, feats, lens, labels, lab_lens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.1, (first, float(loss))
    toks, counts = model.decode_greedy(params, feats, lens)
    toks, counts = np.asarray(toks), np.asarray(counts)
    hits = sum(counts[i] == 3 and (toks[i, :3] == np.asarray(labels)[i]).all()
               for i in range(b))
    assert hits >= 3, (hits, toks[:, :5], np.asarray(labels))


def test_ctc_model_beam_decode():
    """decode_beam top-1 agrees with decode_greedy's collapse on an easy
    (peaked) posterior and returns well-formed K-best."""
    model = CTCModel.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(1))
    cfg = model.config
    b, t = 2, 64
    feats = jnp.asarray(
        np.random.default_rng(6).standard_normal((b, cfg.n_mels, t)) * 0.1,
        jnp.float32)
    lens = jnp.array([t, t // 2], jnp.int32)
    res = jax.jit(lambda p, f, l: model.decode_beam(p, f, l, width=4)
                  )(params, feats, lens)
    assert res.tokens.shape[:2] == (b, 4)
    assert res.counts.shape == (b, 4) and res.scores.shape == (b, 4)
    # scores sorted descending per batch row
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()
