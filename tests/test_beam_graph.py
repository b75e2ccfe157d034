"""Decoding-graph (token trie) constrained beam + beam hardening:
exhaustive-search oracle, graph legality, final-state completion, the
stream-mode 400, and the session token budget in beam mode.

Capability parity target: the reference's k2 FST backend
(ref: src/triton_backends/k2_decoder/k2_decoder_backend.cc:63-253).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.ops.beam import (TokenTrie, backtrace,
                                                beam_decode,
                                                beam_decode_transducer)
from amira_rust_asr_server_tpu.vocab import Vocabulary

BLANK = 3
VOCAB = 4  # labels 0..2, blank=3


def fake_pred(tokens, state):
    out = tokens[:, None].astype(jnp.float32)
    return out, state


def run_beam(joint, enc, lens, k=4, s=3, graph=None):
    trace = beam_decode(fake_pred, joint, enc, jnp.asarray(lens),
                        (jnp.zeros((1, enc.shape[0], 1)),), BLANK,
                        beam_width=k, max_expansions=s, vocab_size=VOCAB,
                        graph=graph)
    return backtrace(trace, np.asarray(lens))


# ---------------------------------------------------------------------------
# trie construction
# ---------------------------------------------------------------------------
def test_trie_structure():
    trie = TokenTrie.from_token_seqs([[1, 2], [1, 3], [4]], vocab_size=6,
                                     loop=False)
    nxt = np.asarray(trie.next_state)
    fin = np.asarray(trie.is_final)
    root = 0
    n1 = nxt[root, 1]
    assert n1 > 0 and nxt[root, 4] > 0
    assert nxt[root, 2] == -1  # 2 not legal from root
    assert nxt[n1, 2] > 0 and nxt[n1, 3] > 0
    assert fin[nxt[n1, 2]] and fin[nxt[n1, 3]] and fin[nxt[root, 4]]
    assert not fin[root] and not fin[n1]


def test_trie_loop_restarts_at_root():
    trie = TokenTrie.from_token_seqs([[1, 2]], vocab_size=4, loop=True)
    nxt = np.asarray(trie.next_state)
    final = nxt[nxt[0, 1], 2]
    assert np.asarray(trie.is_final)[final]
    # final state inherits root's transitions: may start the word again
    assert nxt[final, 1] == nxt[0, 1]


def test_trie_from_phrases_uses_vocab():
    vocab = Vocabulary.from_map({0: "▁hi", 1: "▁yo", 2: "x"})
    trie = TokenTrie.from_phrases(vocab, ["hi", "yo"], vocab_size=4)
    nxt = np.asarray(trie.next_state)
    assert nxt[0, 0] > 0 and nxt[0, 1] > 0 and nxt[0, 2] == -1


# ---------------------------------------------------------------------------
# constrained search semantics (scripted lattices)
# ---------------------------------------------------------------------------
def test_graph_rejects_off_grammar_tokens():
    """Joint screams for token 2 every frame; grammar only allows [0, 1].
    Constrained beam must never emit 2 and must recover the best
    in-grammar path."""
    t = 3
    enc = jnp.zeros((1, t, 1))
    lp = np.log

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        # p(2)=0.65 everywhere; staying silent is expensive (blank cheap
        # only after the word completes)
        sos = jnp.asarray([lp(0.3), lp(0.02), lp(0.65), lp(0.03)])
        after0 = jnp.asarray([lp(0.01), lp(0.3), lp(0.65), lp(0.04)])
        after1 = jnp.asarray([lp(0.01), lp(0.01), lp(0.5), lp(0.48)])
        after2 = jnp.asarray([lp(0.02), lp(0.02), lp(0.6), lp(0.36)])
        table = jnp.stack([after0, after1, after2, sos])
        return table[jnp.clip(last, 0, 3)]

    graph = TokenTrie.from_token_seqs([[0, 1]], vocab_size=VOCAB,
                                      loop=False)
    res = run_beam(joint, enc, [t], k=4, s=3, graph=graph)
    toks = res.tokens[0, :res.counts[0]].tolist()
    assert 2 not in toks
    assert toks == [0, 1]

    # unconstrained beam on the same lattice happily emits 2
    free = run_beam(joint, enc, [t], k=4, s=3)
    assert 2 in free.tokens[0, :free.counts[0]].tolist()


def test_graph_final_state_preferred_over_stranded_prefix():
    """Stopping after token 0 scores higher frame-by-frame, but [0] is a
    dead mid-word prefix of the only grammar word [0, 1]; the constrained
    beam must return the complete word."""
    t = 2
    enc = jnp.zeros((1, t, 1))
    lp = np.log

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        sos = jnp.asarray([lp(0.55), lp(0.01), lp(0.39), lp(0.05)])
        after0 = jnp.asarray([lp(0.01), lp(0.2), lp(0.01), lp(0.78)])
        after1 = jnp.asarray([lp(0.01), lp(0.01), lp(0.01), lp(0.97)])
        table = jnp.stack([after0, after1, sos, sos])
        return table[jnp.clip(last, 0, 3)]

    graph = TokenTrie.from_token_seqs([[0, 1]], vocab_size=VOCAB,
                                      loop=False)
    res = run_beam(joint, enc, [t], k=4, s=3, graph=graph)
    assert res.tokens[0, :res.counts[0]].tolist() == [0, 1]
    # without the graph, the stranded [0] wins on raw score
    free = run_beam(joint, enc, [t], k=4, s=3)
    assert free.tokens[0, :free.counts[0]].tolist() == [0]


# ---------------------------------------------------------------------------
# exhaustive-search oracle (beam hardening)
# ---------------------------------------------------------------------------
def _oracle_best(table: np.ndarray, t_frames: int, s_max: int):
    """Enumerate every alignment (<= s_max-1 emissions per frame, then
    blank) over a last-token-conditioned log-prob table [4, V]; return
    (best score, best token string)."""
    best = (-np.inf, [])

    def rec(t, last, score, seq):
        nonlocal best
        if t == t_frames:
            if score > best[0]:
                best = (score, list(seq))
            return
        # e emissions then blank
        def emit(depth, last, score, seq):
            nonlocal best
            # finalize frame with blank
            rec(t + 1, last, score + table[last, BLANK], seq)
            if depth == s_max - 1:
                return
            for v in range(BLANK):
                seq.append(v)
                emit(depth + 1, v, score + table[last, v], seq)
                seq.pop()
        emit(0, last, score, seq)

    rec(0, BLANK, 0.0, [])
    return best


def test_beam_matches_exhaustive_oracle():
    """With beam width covering the whole candidate space, the TSD beam
    must find the exact max-probability alignment the oracle finds."""
    rng = np.random.default_rng(42)
    # random stateful lattice: rows = last token (0..2, blank=SOS)
    logits = rng.standard_normal((4, VOCAB)) * 2.0
    table = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))

    t_frames, s_max = 3, 3
    jt = jnp.asarray(table, jnp.float32)

    def joint(enc_frame, pred_out):
        last = jnp.clip(pred_out[:, 0].astype(jnp.int32), 0, 3)
        return jt[last]

    enc = jnp.zeros((1, t_frames, 1))
    res = run_beam(joint, enc, [t_frames], k=16, s=s_max)
    want_score, want_seq = _oracle_best(table, t_frames, s_max)
    got = res.tokens[0, :res.counts[0]].tolist()
    assert got == want_seq, (got, want_seq)
    assert abs(res.scores[0] - want_score) < 1e-3


# ---------------------------------------------------------------------------
# WEIGHTED decoding graphs (k2 weighted-FSA parity,
# ref: k2_decoder_backend.cc:63-253 IntersectDensePruned/ShortestPath)
# ---------------------------------------------------------------------------
def test_weighted_trie_structure():
    """Sequence weights land on the LAST arc when that arc is not shared
    with a longer phrase's interior; the prefix phrase [1] (of [1,2])
    realizes its weight at completion (final weight + loop-restart arcs)
    instead, so [1,2] never double-collects it."""
    trie = TokenTrie.from_token_seqs(
        [[1, 2], [1]], vocab_size=4, loop=True,
        weights=[-1.5, -0.25], final_weights=[0.5, 0.0])
    nxt = np.asarray(trie.next_state)
    aw = np.asarray(trie.arc_weight)
    fw = np.asarray(trie.final_weight)
    n1 = nxt[0, 1]
    n12 = nxt[n1, 2]
    assert aw[0, 1] == 0.0            # shared arc carries NO phrase weight
    assert fw[n1] == -0.25            # [1]'s weight realized at completion
    assert aw[n1, 2] == -1.5          # [1,2]'s last arc (n12 is a leaf)
    assert fw[n12] == 0.5
    # loop: final state n12 inherits root's arc 1 plus its OWN final
    # weight (restarting = completing the phrase, epsilon-free closure)
    assert nxt[n12, 1] == n1 and aw[n12, 1] == pytest.approx(0.5)
    # restarting from n1 via a root token also pays [1]'s completion weight
    assert nxt[n1, 1] == n1 and aw[n1, 1] == pytest.approx(-0.25)
    # unweighted default stays all-zero (boolean special case)
    plain = TokenTrie.from_token_seqs([[1, 2]], vocab_size=4)
    assert not np.asarray(plain.arc_weight).any()
    assert not np.asarray(plain.final_weight).any()
    assert not plain.weighted and trie.weighted


def test_weighted_trie_prefix_phrase_no_double_count():
    """Acoustics and grammar make [1,2] the best total-weight path, but a
    heavy weight on the PREFIX phrase [1] must not leak onto [1,2]'s
    score (advisor round-3 finding: last-arc weights on a shared arc
    double-counted into the longer phrase, flipping winners)."""
    lp = np.log
    # single frame, expansions up to 2 tokens then blank; stateless-by-
    # last-token lattice rows: [after0, after1, after2, sos] (rows sum to
    # 1 exactly — beam_decode log_softmaxes the joint output)
    sos = [lp(0.25), lp(0.3), lp(0.05), lp(0.4)]
    after0 = [lp(0.02), lp(0.04), lp(0.04), lp(0.9)]
    after1 = [lp(0.02), lp(0.03), lp(0.5), lp(0.45)]
    after2 = [lp(0.02), lp(0.04), lp(0.04), lp(0.9)]
    table = np.asarray([after0, after1, after2, sos], np.float32)
    jt = jnp.asarray(table)

    def joint(enc_frame, pred_out):
        last = jnp.clip(pred_out[:, 0].astype(jnp.int32), 0, 3)
        return jt[last]

    graph = TokenTrie.from_token_seqs(
        [[1], [1, 2], [0]], vocab_size=VOCAB, loop=False,
        weights=[-10.0, 0.0, -1.0])
    enc = jnp.zeros((1, 1, 1))
    res = run_beam(joint, enc, [1], k=8, s=3, graph=graph)
    got = res.tokens[0, :res.counts[0]].tolist()
    # correct totals: [1,2] = ln.3+ln.5+ln.9 ~= -2.00 (NO -10 leak);
    # [0] = ln.25+ln.9-1.0 ~= -2.49; [1] = ln.3+ln.45-10 ~= -12.0
    assert got == [1, 2], got
    want = lp(0.3) + lp(0.5) + lp(0.9)
    assert abs(res.scores[0] - want) < 1e-3


@pytest.mark.parametrize("seed", [0, 3])
def test_weighted_beam_oracle_prefix_grammar(seed):
    """Exhaustive oracle over a grammar where one phrase is a prefix of
    another (the advisor's untested case), including loop restarts."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((4, VOCAB)) * 2.0
    table = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))

    graph = TokenTrie.from_token_seqs(
        [[0], [0, 1], [2]], vocab_size=VOCAB, loop=True,
        weights=list(rng.standard_normal(3) * 2.0),
        final_weights=list(rng.standard_normal(3)))
    nxt = np.asarray(graph.next_state)
    fin = np.asarray(graph.is_final)
    aw = np.asarray(graph.arc_weight)
    fw = np.asarray(graph.final_weight)

    t_frames, s_max = 3, 3
    jt = jnp.asarray(table, jnp.float32)

    def joint(enc_frame, pred_out):
        last = jnp.clip(pred_out[:, 0].astype(jnp.int32), 0, 3)
        return jt[last]

    enc = jnp.zeros((1, t_frames, 1))
    # k=32: no pruning — see test_weighted_beam_matches_exhaustive_oracle
    res = run_beam(joint, enc, [t_frames], k=32, s=s_max, graph=graph)
    want_score, want_seq = _oracle_best_weighted(
        table, t_frames, s_max, nxt, fin, aw, fw)
    got = res.tokens[0, :res.counts[0]].tolist()
    assert got == want_seq, (got, want_seq)
    assert abs(res.scores[0] - want_score) < 1e-3


def test_from_tables_arbitrary_fsa():
    nxt = np.array([[1, -1, -1, -1], [-1, 0, -1, -1]], np.int32)
    trie = TokenTrie.from_tables(nxt, [False, True],
                                 arc_weight=[[-.5, 0, 0, 0], [0, 0, 0, 0]],
                                 final_weight=[0.0, -2.0])
    assert trie.n_states == 2
    assert float(np.asarray(trie.final_weight)[1]) == -2.0
    plain = TokenTrie.from_tables(nxt, [False, True])
    assert not plain.weighted


@pytest.mark.slow
def test_graph_weights_flip_the_winner():
    """Acoustics prefer token 0; the graph weight on phrase [1] outweighs
    the acoustic gap, so the weighted search must return [1] — the k2
    property that the best WEIGHTED path differs from the best acoustic
    path."""
    t = 2
    enc = jnp.zeros((1, t, 1))
    lp = np.log

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        # from SOS: p(0)=0.4 > p(1)=0.2; after any label, blank is likely
        sos = jnp.asarray([lp(0.4), lp(0.2), lp(0.05), lp(0.35)])
        after = jnp.asarray([lp(0.02), lp(0.02), lp(0.02), lp(0.94)])
        table = jnp.stack([after, after, after, sos])
        return table[jnp.clip(last, 0, 3)]

    unweighted = TokenTrie.from_token_seqs([[0], [1]], vocab_size=VOCAB,
                                           loop=False)
    res = run_beam(joint, enc, [t], k=4, s=2, graph=unweighted)
    assert res.tokens[0, :res.counts[0]].tolist() == [0]

    # log(0.2) + w > log(0.4)  <=>  w > log(2) ~ 0.69
    weighted = TokenTrie.from_token_seqs([[0], [1]], vocab_size=VOCAB,
                                         loop=False, weights=[0.0, 1.5])
    res = run_beam(joint, enc, [t], k=4, s=2, graph=weighted)
    assert res.tokens[0, :res.counts[0]].tolist() == [1]
    # the winning score includes the graph weight (acoustic + graph total)
    free = run_beam(joint, enc, [t], k=4, s=2)
    assert res.scores[0] > free.scores[0] - 1e-3


def test_final_weights_rank_hypotheses():
    """Two complete phrases, same acoustics: the final weight decides."""
    t = 2
    enc = jnp.zeros((1, t, 1))
    lp = np.log

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        sos = jnp.asarray([lp(0.3), lp(0.3), lp(0.05), lp(0.35)])
        after = jnp.asarray([lp(0.02), lp(0.02), lp(0.02), lp(0.94)])
        table = jnp.stack([after, after, after, sos])
        return table[jnp.clip(last, 0, 3)]

    g = TokenTrie.from_token_seqs([[0], [1]], vocab_size=VOCAB, loop=False,
                                  final_weights=[-3.0, 0.0])
    res = run_beam(joint, enc, [t], k=4, s=2, graph=g)
    assert res.tokens[0, :res.counts[0]].tolist() == [1]
    g2 = TokenTrie.from_token_seqs([[0], [1]], vocab_size=VOCAB, loop=False,
                                   final_weights=[0.0, -3.0])
    res2 = run_beam(joint, enc, [t], k=4, s=2, graph=g2)
    assert res2.tokens[0, :res2.counts[0]].tolist() == [0]


def _oracle_best_weighted(table, t_frames, s_max, nxt, fin, aw, fw):
    """Exhaustive max over all graph-legal alignments, scoring acoustic +
    arc weights + final weight (the ShortestPath total-weight objective).
    Non-final endings are demoted exactly like backtrace (-1e12)."""
    best = (-np.inf, [])

    def rec(t, last, g, score, seq):
        nonlocal best
        if t == t_frames:
            total = score
            # strict FSA acceptance: empty is final only if the start
            # state is (matches beam_decode's pool_final)
            if seq and fin[g]:
                total += fw[g]
            elif not fin[g] or (not seq and not fin[0]):
                total -= 1e12
            if total > best[0]:
                best = (total, list(seq))
            return

        def emit(depth, last, g, score, seq):
            rec(t + 1, last, g, score + table[last, BLANK], seq)
            if depth == s_max - 1:
                return
            for v in range(BLANK):
                if nxt[g, v] < 0:
                    continue
                seq.append(v)
                emit(depth + 1, v, nxt[g, v],
                     score + table[last, v] + aw[g, v], seq)
                seq.pop()
        emit(0, last, g, score, seq)

    rec(0, BLANK, 0, 0.0, [])
    return best


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_weighted_beam_matches_exhaustive_oracle(seed):
    """Full-width beam over a random lattice + random WEIGHTED grammar must
    find exactly the oracle's best total-weight path."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((4, VOCAB)) * 2.0
    table = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))

    graph = TokenTrie.from_token_seqs(
        [[0, 1], [1], [2, 0]], vocab_size=VOCAB, loop=True,
        weights=list(rng.standard_normal(3) * 2.0),
        final_weights=list(rng.standard_normal(3)))
    nxt = np.asarray(graph.next_state)
    fin = np.asarray(graph.is_final)
    aw = np.asarray(graph.arc_weight)
    fw = np.asarray(graph.final_weight)

    t_frames, s_max = 3, 3
    jt = jnp.asarray(table, jnp.float32)

    def joint(enc_frame, pred_out):
        last = jnp.clip(pred_out[:, 0].astype(jnp.int32), 0, 3)
        return jt[last]

    enc = jnp.zeros((1, t_frames, 1))
    # k=32: wide enough to hold EVERY graph-legal alignment — final
    # weights are collected when decoding ends, so they cannot shape the
    # frame-by-frame pruning; an exactness test must not prune at all
    res = run_beam(joint, enc, [t_frames], k=32, s=s_max, graph=graph)
    want_score, want_seq = _oracle_best_weighted(
        table, t_frames, s_max, nxt, fin, aw, fw)
    got = res.tokens[0, :res.counts[0]].tolist()
    assert got == want_seq, (got, want_seq)
    assert abs(res.scores[0] - want_score) < 1e-3


# ---------------------------------------------------------------------------
# real-model grammar constraint + pipeline/serving integration
# ---------------------------------------------------------------------------
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
CKPT = REPO / "model-repo" / "tiny-digits"
DVOCAB = REPO / "model-repo" / "tiny-digits-vocab.txt"

needs_digits = pytest.mark.skipif(not CKPT.exists(),
                                  reason="tiny-digits checkpoint missing")


@pytest.fixture(scope="module")
def digits():
    from amira_rust_asr_server_tpu.models import Transducer
    model = Transducer.from_preset("tiny")
    params = model.load_checkpoint(str(CKPT))
    vocab = Vocabulary.load(DVOCAB)
    return model, params, vocab


@needs_digits
@pytest.mark.slow
def test_grammar_restricts_digits_model(digits):
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.testing import synth_digits
    model, params, vocab = digits

    def encode(words):
        wave = synth_digits(words, noise=0.004,
                            rng=np.random.default_rng(21))
        audio = np.zeros((1, 32000), np.float32)
        audio[0, :len(wave)] = wave
        feats, fl = log_mel_features(jnp.asarray(audio),
                                     jnp.asarray([len(wave)], jnp.int32),
                                     n_mels=model.config.n_mels)
        return model.encode(params, feats, fl)

    graph = TokenTrie.from_phrases(vocab, ["two", "five"],
                                   model.config.vocab_size, loop=True)

    enc, lens = encode(["two", "five", "two"])
    res = beam_decode_transducer(model, params, enc, lens, beam_width=4,
                                 graph=graph)
    toks = res.tokens[0, :res.counts[0]].tolist()
    assert vocab.decode_tokens(toks) == "two five two"

    # off-grammar audio: output must stay within the grammar's tokens
    enc, lens = encode(["nine", "four"])
    res = beam_decode_transducer(model, params, enc, lens, beam_width=4,
                                 graph=graph)
    toks = res.tokens[0, :res.counts[0]].tolist()
    legal = {vocab.get_id("▁two"), vocab.get_id("▁five")}
    assert set(toks) <= legal


@needs_digits
@pytest.mark.slow
def test_pipeline_grammar_path_config(digits, tmp_path):
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.testing import synth_digits
    model, params, vocab = digits
    grammar = tmp_path / "grammar.txt"
    grammar.write_text("one\nsix\n", encoding="utf-8")
    cfg = Config(audio_sec_buckets=[2.0], batch_buckets=[1],
                 decoding_mode="beam", beam_width=4,
                 beam_grammar_path=str(grammar), compute_dtype="float32")
    pipe = AsrPipeline(model, params, vocab, cfg)
    assert pipe.beam_graph is not None
    wave = synth_digits(["one", "six"], noise=0.004,
                        rng=np.random.default_rng(22))
    tr = pipe.process_batch_samples(wave)
    assert tr.text == "one six"


@needs_digits
def test_weighted_grammar_golden_digits(digits):
    """Weighted-grammar golden on the trained checkpoint: with both words
    legal, a strong negative weight on the acoustically-correct word flips
    the transcript to the weighted alternative — weights shape real-model
    decodes, not just scripted lattices."""
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.testing import synth_digits
    model, params, vocab = digits

    wave = synth_digits(["two"], noise=0.004, rng=np.random.default_rng(5))
    audio = np.zeros((1, 32000), np.float32)
    audio[0, :len(wave)] = wave
    feats, fl = log_mel_features(jnp.asarray(audio),
                                 jnp.asarray([len(wave)], jnp.int32),
                                 n_mels=model.config.n_mels)
    enc, lens = model.encode(params, feats, fl)

    neutral = TokenTrie.from_phrases(vocab, ["two", "five"],
                                     model.config.vocab_size, loop=True)
    res = beam_decode_transducer(model, params, enc, lens, beam_width=4,
                                 graph=neutral)
    assert vocab.decode_tokens(
        res.tokens[0, :res.counts[0]].tolist()) == "two"

    steered = TokenTrie.from_phrases(vocab, ["two", "five"],
                                     model.config.vocab_size, loop=True,
                                     weights=[-50.0, 0.0])
    res = beam_decode_transducer(model, params, enc, lens, beam_width=4,
                                 graph=steered)
    assert vocab.decode_tokens(
        res.tokens[0, :res.counts[0]].tolist()) == "five"


@needs_digits
def test_pipeline_weighted_grammar_file(digits, tmp_path):
    """Grammar file lines may carry per-phrase TAB-separated log weights."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.testing import synth_digits
    model, params, vocab = digits
    grammar = tmp_path / "grammar_weighted.txt"
    grammar.write_text("one\t-50.0\nsix\t0.0\n", encoding="utf-8")
    cfg = Config(audio_sec_buckets=[2.0], batch_buckets=[1],
                 decoding_mode="beam", beam_width=4,
                 beam_grammar_path=str(grammar), compute_dtype="float32")
    pipe = AsrPipeline(model, params, vocab, cfg)
    assert pipe.beam_graph is not None and pipe.beam_graph.weighted
    wave = synth_digits(["one"], noise=0.004,
                        rng=np.random.default_rng(23))
    tr = pipe.process_batch_samples(wave)
    # "one" is acoustically right but carries -50; "six" wins
    assert tr.text == "six"


@pytest.mark.slow
def test_grammar_file_rejects_junk_weight(tmp_path):
    """'phrase<TAB>non-number' is a config error, not a phrase that
    happens to contain a tab (advisor round-3 finding)."""
    import jax as _jax
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.errors import ConfigValidationError
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    model = Transducer.from_preset("tiny")
    params = model.init(_jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    grammar = tmp_path / "grammar_bad.txt"
    grammar.write_text("hello\tabc\n", encoding="utf-8")
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_width=2,
                 beam_grammar_path=str(grammar), compute_dtype="float32")
    with pytest.raises(ConfigValidationError, match="non-numeric"):
        AsrPipeline(model, params, vocab, cfg)


def test_beam_honors_max_total_budget():
    """Session token budget: beam transcriptions truncate at
    config.max_total_tokens (ref: MAX_TOTAL_TOKENS, constants.rs:136)."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    # emission-happy joint so the budget actually binds
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[model.config.blank_id].add(-2.0))
    vocab = Vocabulary.from_map({i: f"w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_width=2, max_total_tokens=7,
                 compute_dtype="float32")
    pipe = AsrPipeline(model, params, vocab, cfg)
    w = (np.random.default_rng(3).standard_normal(6000) * 0.3
         ).astype(np.float32)
    tr = pipe.process_batch_samples(w)
    assert len(tr.tokens) <= 7


def test_stream_rejected_in_beam_mode():
    import asyncio
    import sys
    sys.path.insert(0, "tests")
    from test_server import make_state, run, with_client

    async def go(client):
        resp = await client.get("/v2/decode/stream/default")
        assert resp.status == 400
        body = await resp.json()
        assert body["error"] == "unsupported_decoding_mode"
    run(with_client(make_state(decoding_mode="beam",
                               compute_dtype="float32"), go))
