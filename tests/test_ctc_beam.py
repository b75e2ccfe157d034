"""CTC prefix beam search vs two oracles.

1. A dict-based numpy prefix beam search (the textbook algorithm with
   exact duplicate merging) — the jittable kernel must reproduce its
   beams exactly when given the full vocab as candidates.
2. Exhaustive enumeration: with a wide beam on tiny shapes the top
   hypothesis must be the true max-posterior labeling, where each
   labeling's posterior is the summed probability of all alignments
   (computed independently via ops.ctc.ctc_loss).
Grammar cases reuse the weighted TokenTrie (same object as the
transducer beam and the OpenFST importer).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.ops.beam import TokenTrie
from amira_rust_asr_server_tpu.ops.ctc import ctc_loss
from amira_rust_asr_server_tpu.ops.ctc_beam import ctc_beam_decode

BLANK = 5
V = 6  # tokens 0..4 + blank


def _lp(rng, t):
    x = rng.standard_normal((t, V)) * 2.0
    return jax.nn.log_softmax(jnp.asarray(x, jnp.float32), axis=-1)


def _np_prefix_beam(lp, width, blank=BLANK):
    """Textbook prefix beam search with exact merging (dict-keyed)."""
    lp = np.asarray(lp)

    def ladd(a, b):
        if a == -np.inf:
            return b
        if b == -np.inf:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    beams = {(): (0.0, -np.inf)}  # prefix -> (p_b, p_nb)
    for t in range(lp.shape[0]):
        new = {}

        def upd(pref, pb, pnb):
            opb, opnb = new.get(pref, (-np.inf, -np.inf))
            new[pref] = (ladd(opb, pb), ladd(opnb, pnb))

        for pref, (pb, pnb) in beams.items():
            # stay: blank extension + repeat-without-blank
            upd(pref, ladd(pb, pnb) + lp[t, blank],
                (pnb + lp[t, pref[-1]]) if pref else -np.inf)
            for v in range(V):
                if v == blank:
                    continue
                base = pb if (pref and v == pref[-1]) else ladd(pb, pnb)
                upd(pref + (v,), -np.inf, base + lp[t, v])
        beams = dict(sorted(new.items(),
                            key=lambda kv: -ladd(*kv[1]))[:width])
    return [(list(p), ladd(*s)) for p, s in sorted(
        beams.items(), key=lambda kv: -ladd(*kv[1]))]


@pytest.mark.parametrize("seed,t", [(0, 6), (1, 9), (2, 12), (3, 7)])
def test_matches_numpy_reference(seed, t):
    rng = np.random.default_rng(seed)
    lp = _lp(rng, t)
    width = 6
    ref = _np_prefix_beam(lp, width)

    res = jax.jit(lambda lp: ctc_beam_decode(
        lp[None], jnp.asarray([t], jnp.int32), BLANK,
        width=width, cand=V))(lp)
    for i, (ref_toks, ref_score) in enumerate(ref):
        got = [int(x) for x in
               np.asarray(res.tokens)[0, i, :int(res.counts[0, i])]]
        assert got == ref_toks, (i, got, ref_toks)
        np.testing.assert_allclose(float(res.scores[0, i]), ref_score,
                                   rtol=1e-4, atol=1e-4)


def test_wide_beam_finds_max_posterior_labeling():
    """Top-1 of a full-width beam == exact argmax over all labelings,
    scored independently by the CTC forward algorithm (ops.ctc.ctc_loss).

    Exactness needs width >= #distinct labelings (a pruned prefix can't
    recover mass that arrives later — with t=5/V=6 and width 64 the beam
    legitimately missed [1,3,0] by 0.024 nats), so the case is sized to
    fit: 3 tokens + blank, t=4 -> sum_{n<=4} 3^n = 121 prefixes < 128."""
    rng = np.random.default_rng(7)
    t = 4
    v2, blank2 = 4, 3  # tokens 0..2 + blank
    x = rng.standard_normal((t, v2)) * 2.0
    lp = jax.nn.log_softmax(jnp.asarray(x, jnp.float32), axis=-1)

    best, best_nll = None, np.inf
    for n in range(0, t + 1):
        for lab in itertools.product(range(v2 - 1), repeat=n):
            # CTC can't emit adjacent repeats without extra frames;
            # the loss handles that (returns +inf-ish for impossible)
            labels = jnp.asarray([list(lab) + [0] * (t - n)], jnp.int32)
            nll = float(ctc_loss(lp[None], jnp.asarray([t], jnp.int32),
                                 labels, jnp.asarray([n], jnp.int32),
                                 blank2)[0])
            if nll < best_nll:
                best, best_nll = list(lab), nll

    res = ctc_beam_decode(lp[None], jnp.asarray([t], jnp.int32), blank2,
                          width=128, cand=v2)
    got = [int(x) for x in np.asarray(res.tokens)[0, 0,
                                                  :int(res.counts[0, 0])]]
    assert got == best, (got, best, best_nll, float(res.scores[0, 0]))
    np.testing.assert_allclose(float(res.scores[0, 0]), -best_nll,
                               rtol=1e-4, atol=1e-4)


def test_batched_equals_single():
    rng = np.random.default_rng(11)
    t = 8
    lps = jnp.stack([_lp(rng, t) for _ in range(3)])
    lens = jnp.asarray([t, t - 3, t - 5], jnp.int32)
    batched = ctc_beam_decode(lps, lens, BLANK, width=5, cand=V)
    for i in range(3):
        single = ctc_beam_decode(lps[i:i + 1], lens[i:i + 1], BLANK,
                                 width=5, cand=V)
        np.testing.assert_array_equal(np.asarray(batched.tokens[i]),
                                      np.asarray(single.tokens[0]))
        np.testing.assert_allclose(np.asarray(batched.scores[i]),
                                   np.asarray(single.scores[0]),
                                   rtol=1e-5, atol=1e-5)


def test_grammar_constrains_and_weights_rank():
    """Strict graph decoding: only trie-legal prefixes survive; arc
    weights shift the ranking exactly by their sum."""
    rng = np.random.default_rng(3)
    t = 8
    lp = _lp(rng, t)
    lens = jnp.asarray([t], jnp.int32)

    legal = [[1, 2], [3], [3, 4, 1]]
    trie = TokenTrie.from_token_seqs(legal, V, loop=False)
    res = ctc_beam_decode(lp[None], lens, BLANK, width=8, cand=V,
                          graph=trie, strict=True)
    hyps = []
    for i in range(8):
        if float(res.scores[0, i]) <= -1e29:
            continue
        hyps.append([int(x) for x in
                     np.asarray(res.tokens)[0, i, :int(res.counts[0, i])]])
    assert hyps, "no legal hypothesis survived"
    closed = [list(s) for s in legal] + [[]]
    for h in hyps:
        assert h in closed, h

    # weight on [3] large enough to outrank: ranking must flip to [3]
    trie_w = TokenTrie.from_token_seqs(legal, V, loop=False,
                                       weights=[0.0, 50.0, 0.0])
    res_w = ctc_beam_decode(lp[None], lens, BLANK, width=8, cand=V,
                            graph=trie_w, strict=True)
    top = [int(x) for x in
           np.asarray(res_w.tokens)[0, 0, :int(res_w.counts[0, 0])]]
    assert top == [3], top
    # and the score moved by exactly the weight
    for i in range(8):
        if [int(x) for x in np.asarray(
                res.tokens)[0, i, :int(res.counts[0, i])]] == [3]:
            np.testing.assert_allclose(
                float(res_w.scores[0, 0]),
                float(res.scores[0, i]) + 50.0, rtol=1e-5)
            break


def test_shallow_fusion_bias_shifts_scores():
    rng = np.random.default_rng(5)
    t = 6
    lp = _lp(rng, t)
    lens = jnp.asarray([t], jnp.int32)
    plain = ctc_beam_decode(lp[None], lens, BLANK, width=4, cand=V)
    bias = jnp.zeros((V,), jnp.float32).at[2].set(30.0)
    biased = ctc_beam_decode(lp[None], lens, BLANK, width=4, cand=V,
                             bias=bias)
    top = [int(x) for x in
           np.asarray(biased.tokens)[0, 0, :int(biased.counts[0, 0])]]
    assert 2 in top, (top, "bias should force token 2 into the top hyp")
    top_plain = [int(x) for x in
                 np.asarray(plain.tokens)[0, 0, :int(plain.counts[0, 0])]]
    assert top != top_plain or 2 in top_plain


def test_max_tokens_caps_length():
    rng = np.random.default_rng(9)
    t = 10
    lp = _lp(rng, t)
    res = ctc_beam_decode(lp[None], jnp.asarray([t], jnp.int32), BLANK,
                          width=4, cand=V, max_tokens=2)
    assert int(np.asarray(res.counts).max()) <= 2
