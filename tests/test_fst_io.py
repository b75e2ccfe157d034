"""OpenFST text-format decoding-graph importer (ops/fst_io.py).

Capability parity target: the reference loads a compiled decoding-graph
FST from DECODING_GRAPH_PATH and intersects it with the lattice
(ref: src/triton_backends/k2_decoder/k2_decoder_backend.cc:96-117). Here
the standard text format compiles to the dense TokenTrie, with exact
tropical-semiring epsilon removal + determinization; these tests check
the importer against brute-force NFA path enumeration and drive the
constrained beam end-to-end from a text-FST fixture file.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.ops.beam import TokenTrie, backtrace, \
    beam_decode
from amira_rust_asr_server_tpu.ops.fst_io import (
    FstFormatError, load_symbols, token_trie_from_openfst_file,
    token_trie_from_openfst_text)
from amira_rust_asr_server_tpu.vocab import Vocabulary

NEG_INF = float("-inf")


def trie_score(trie: TokenTrie, seq) -> float:
    """Total weight of `seq` through the dense trie (-inf if illegal or
    non-final): arc weights along the path + final weight at the end —
    the quantity beam search accumulates."""
    nxt = np.asarray(trie.next_state)
    fin = np.asarray(trie.is_final)
    aw = np.asarray(trie.arc_weight)
    fw = np.asarray(trie.final_weight)
    s, total = 0, 0.0
    for tok in seq:
        if nxt[s, tok] < 0:
            return NEG_INF
        total += float(aw[s, tok])
        s = int(nxt[s, tok])
    if not fin[s]:
        return NEG_INF
    return total + float(fw[s])


def nfa_best_score(start, arcs, eps, finals, seq) -> float:
    """Brute-force best path weight of `seq` through the raw NFA
    (epsilon arcs included), in log-prob space (higher is better)."""
    def closure(states):
        out = dict(states)
        frontier = list(states.items())
        for _ in range(50):
            nxt = {}
            for s, w in frontier:
                for t, ew in eps.get(s, ()):
                    c = w + ew
                    if c > out.get(t, NEG_INF) + 1e-12:
                        out[t] = c
                        nxt[t] = c
            if not nxt:
                break
            frontier = list(nxt.items())
        return out

    cur = closure({start: 0.0})
    for tok in seq:
        step = {}
        for s, w in cur.items():
            for (dst, lbl, aw) in arcs.get(s, ()):
                if lbl == tok:
                    c = w + aw
                    if c > step.get(dst, NEG_INF):
                        step[dst] = c
        if not step:
            return NEG_INF
        cur = closure(step)
    best = NEG_INF
    for s, w in cur.items():
        if s in finals:
            best = max(best, w + finals[s])
    return best


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------
def test_acceptor_basic_parse_and_walk():
    # "0 -1-> 1 -2-> 2(final)" with costs 0.5 / 0.25, final cost 0.125
    text = """
    0 1 1 0.5
    1 2 2 0.25
    2 0.125
    """
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie.n_states == 3
    got = trie_score(trie, [1, 2])
    assert got == pytest.approx(-(0.5 + 0.25 + 0.125))
    assert trie_score(trie, [1]) == NEG_INF      # not final mid-path
    assert trie_score(trie, [2]) == NEG_INF      # no such arc from root
    assert trie.weighted


def test_unweighted_arcs_and_final():
    text = "0 1 3\n1"
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie_score(trie, [3]) == 0.0
    assert not trie.weighted


def test_transducer_autodetect_ignores_olabel():
    # 5-field lines => transducer: src dst ilabel olabel weight
    text = "0 1 1 7 0.5\n1 2 2 8\n2"
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie_score(trie, [1, 2]) == pytest.approx(-0.5)


def test_start_state_is_first_line_source():
    # start is 3, not 0
    text = "3 1 2\n1 0.0"
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie_score(trie, [2]) == 0.0


def test_comments_and_blank_lines():
    text = "# decoding graph\n\n0 1 1\n# done\n1\n"
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie_score(trie, [1]) == 0.0


def test_parse_errors():
    with pytest.raises(FstFormatError):
        token_trie_from_openfst_text("", vocab_size=4)
    with pytest.raises(FstFormatError):
        token_trie_from_openfst_text("0 1 x", vocab_size=4)
    with pytest.raises(FstFormatError):
        token_trie_from_openfst_text("0 1 1 2 3 4", vocab_size=4)
    with pytest.raises(FstFormatError):  # token id out of vocab range
        token_trie_from_openfst_text("0 1 9\n1", vocab_size=4)
    with pytest.raises(FstFormatError):  # junk weight on a final line
        token_trie_from_openfst_text("0 1 1\n1 abc", vocab_size=4)


def test_duplicate_final_lines_max_merge():
    # two final lines for one state: best (lowest cost) wins, FSA-union
    text = "0 1 1\n1 2.0\n1 0.5"
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie_score(trie, [1]) == pytest.approx(-0.5)


# ---------------------------------------------------------------------------
# epsilon removal + determinization (exactness vs brute force)
# ---------------------------------------------------------------------------
def test_epsilon_removal():
    # 0 -eps(1.0)-> 1 -2(0.5)-> 2(final); eps labeled id 0
    text = "0 1 0 1.0\n1 2 2 0.5\n2"
    trie = token_trie_from_openfst_text(text, vocab_size=4, eps_id=0)
    assert trie_score(trie, [2]) == pytest.approx(-1.5)
    # without eps_id, label 0 is a real token
    trie2 = token_trie_from_openfst_text(text, vocab_size=4)
    assert trie2.n_states >= 3
    assert trie_score(trie2, [0, 2]) == pytest.approx(-1.5)
    assert trie_score(trie2, [2]) == NEG_INF


def test_epsilon_positive_cycle_rejected():
    # eps cycle whose log-prob GAINS each lap (cost -1) diverges
    text = "0 1 0 -1.0\n1 0 0 0.0\n1 2 1\n2"
    with pytest.raises(FstFormatError):
        token_trie_from_openfst_text(text, vocab_size=4, eps_id=0)


def test_epsilon_zero_cycle_ok():
    text = "0 1 0 0.0\n1 0 0 0.0\n1 2 1 0.5\n2"
    trie = token_trie_from_openfst_text(text, vocab_size=4, eps_id=0)
    assert trie_score(trie, [1]) == pytest.approx(-0.5)


def test_nondeterministic_best_path_preserved():
    """Two NFA paths accept [1, 2] with different totals; the determinized
    trie must carry the better one (ShortestPath totals, exactly)."""
    text = """
    0 1 1 0.5
    0 2 1 0.1
    1 3 2 0.1
    2 3 2 0.9
    3 0.0
    """
    trie = token_trie_from_openfst_text(text, vocab_size=4)
    # best total: min(0.5+0.1, 0.1+0.9) = 0.6 -> log-prob -0.6
    assert trie_score(trie, [1, 2]) == pytest.approx(-0.6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_nfa_matches_bruteforce(seed):
    """Random weighted NFAs with epsilons: every token sequence up to
    length 4 scores identically through the determinized dense trie and
    the brute-force NFA evaluation."""
    rng = np.random.default_rng(seed)
    n_states, vocab = 5, 3
    arcs = {}
    eps = {}
    for _ in range(10):
        s, d = int(rng.integers(n_states)), int(rng.integers(n_states))
        lbl = int(rng.integers(vocab))
        w = float(np.round(rng.normal() * 0.7, 3))
        arcs.setdefault(s, []).append((d, lbl, w))
    for _ in range(2):
        s, d = int(rng.integers(n_states)), int(rng.integers(n_states))
        if s == d:
            continue  # keep closures finite without cycle bookkeeping
        eps.setdefault(s, []).append((d, float(np.round(-abs(rng.normal()),
                                                        3))))
    finals = {int(s): float(np.round(rng.normal(), 3))
              for s in rng.choice(n_states, size=2, replace=False)}
    lines = [f"{s} {d} {lbl + 1} {-w}"  # label 0 reserved for eps
             for s, outs in arcs.items() for (d, lbl, w) in outs]
    lines += [f"{s} {d} 0 {-w}" for s, outs in eps.items()
              for (d, w) in outs]
    lines += [f"{s} {-w}" for s, w in finals.items()]
    # ensure deterministic start: state 0 first
    lines.sort(key=lambda ln: ln.split()[0] != "0")
    trie = token_trie_from_openfst_text(
        "\n".join(lines), vocab_size=vocab + 1, eps_id=0)
    for ln in range(5):
        for seq in itertools.product(range(vocab), repeat=ln):
            want = nfa_best_score(0, arcs, eps, finals, list(seq))
            got = trie_score(trie, [t + 1 for t in seq])
            if want == NEG_INF:
                assert got == NEG_INF, (seq, got)
            else:
                assert got == pytest.approx(want, abs=1e-5), (seq, got,
                                                              want)


# ---------------------------------------------------------------------------
# symbol tables
# ---------------------------------------------------------------------------
def test_symbol_table_mapping(tmp_path):
    syms = tmp_path / "g.syms"
    syms.write_text("<eps> 0\n▁hi 1\n▁yo 2\n", encoding="utf-8")
    vocab = Vocabulary.from_map({0: "▁yo", 1: "▁hi", 2: "x"})
    text = "0 1 1 0.5\n1 2 2\n2"
    trie = token_trie_from_openfst_text(
        text, vocab_size=4, isymbols=load_symbols(str(syms)), vocab=vocab)
    # FST label 1 = "▁hi" -> vocab id 1; label 2 = "▁yo" -> vocab id 0
    assert trie_score(trie, [1, 0]) == pytest.approx(-0.5)
    assert trie_score(trie, [0, 1]) == NEG_INF


def test_symbol_table_epsilon_and_missing_symbol(tmp_path):
    vocab = Vocabulary.from_map({0: "▁a"})
    trie = token_trie_from_openfst_text(
        "0 1 0 0.25\n1 2 1\n2", vocab_size=2,
        isymbols={"<eps>": 0, "▁a": 1}, vocab=vocab)
    assert trie_score(trie, [0]) == pytest.approx(-0.25)
    with pytest.raises(FstFormatError):
        token_trie_from_openfst_text(
            "0 1 1\n1", vocab_size=2, isymbols={"▁zzz": 1},
            vocab=vocab)


def test_file_variant_autodiscovers_syms(tmp_path):
    fst = tmp_path / "graph.fst.txt"
    fst.write_text("0 1 1\n1 2 2\n2\n", encoding="utf-8")
    (tmp_path / "graph.syms").write_text(
        "<eps> 0\n▁a 1\n▁b 2\n", encoding="utf-8")
    vocab = Vocabulary.from_map({0: "▁a", 1: "▁b"})
    trie = token_trie_from_openfst_file(str(fst), vocab_size=3,
                                        vocab=vocab)
    assert trie_score(trie, [0, 1]) == 0.0
    assert trie_score(trie, [1, 0]) == NEG_INF


def test_equivalent_to_from_token_seqs():
    """A pure-lexicon text FST and from_token_seqs agree on every short
    sequence (acceptance + totals), loop=False topology."""
    seqs = [[1, 2], [1], [2, 2]]
    ref = TokenTrie.from_token_seqs(seqs, vocab_size=4, loop=False,
                                    weights=[-0.5, -1.0, 0.25])
    # same language, weight on the last arc of each phrase
    text = """
    0 1 1 0.0
    1 4 2 0.5
    0 2 2 0.0
    2 3 2 -0.25
    1 1.0
    4 0.0
    3 0.0
    """
    got = token_trie_from_openfst_text(text, vocab_size=4)
    for ln in range(4):
        for seq in itertools.product(range(3), repeat=ln):
            a, b = trie_score(ref, seq), trie_score(got, seq)
            if a == NEG_INF or b == NEG_INF:
                assert a == b, (seq, a, b)
            else:
                assert a == pytest.approx(b, abs=1e-5), (seq, a, b)


# ---------------------------------------------------------------------------
# end-to-end: text-FST fixture constrains the beam, weighted oracle
# ---------------------------------------------------------------------------
BLANK = 3
VOCAB = 4


def _fake_pred(tokens, state):
    return tokens[:, None].astype(jnp.float32), state


def _run_beam(joint, enc, lens, k=8, s=3, graph=None):
    trace = beam_decode(_fake_pred, joint, enc, jnp.asarray(lens),
                        (jnp.zeros((1, enc.shape[0], 1)),), BLANK,
                        beam_width=k, max_expansions=s, vocab_size=VOCAB,
                        graph=graph)
    return backtrace(trace, np.asarray(lens))


def test_beam_constrained_by_text_fst(tmp_path):
    """Acoustics prefer token 0, but the loaded FST only accepts [1] (with
    a bonus weight) or [0] at a heavy cost — the k2 property that the
    best WEIGHTED path wins, driven from a DECODING_GRAPH_PATH-style text
    asset."""
    lp = np.log
    fst = tmp_path / "bias.fst.txt"
    # costs: [0] costs 2.0; [1] costs -1.5 (bonus)
    fst.write_text("0 1 0 2.0\n0 2 1 -1.5\n1 0.0\n2 0.0\n",
                   encoding="utf-8")
    graph = token_trie_from_openfst_file(str(fst), vocab_size=VOCAB)

    def joint(enc_frame, pred_out):
        last = pred_out[:, 0].astype(jnp.int32)
        sos = jnp.asarray([lp(0.4), lp(0.2), lp(0.05), lp(0.35)])
        after = jnp.asarray([lp(0.02), lp(0.02), lp(0.02), lp(0.94)])
        table = jnp.stack([after, after, after, sos])
        return table[jnp.clip(last, 0, 3)]

    enc = jnp.zeros((1, 2, 1))
    res = _run_beam(joint, enc, [2], graph=graph)
    assert res.tokens[0, :res.counts[0]].tolist() == [1]
    # total = acoustic (emit 1, then blank on both frames) + arc weight
    # (cost negated)
    assert res.scores[0] == pytest.approx(lp(0.2) + 2 * lp(0.94) + 1.5,
                                          abs=1e-3)


def test_pipeline_loads_fst_grammar(tmp_path):
    """Config.beam_grammar_path ending in .fst.txt rides the OpenFST
    importer inside AsrPipeline (the DECODING_GRAPH_PATH analogue)."""
    import jax

    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline

    fst = tmp_path / "g.fst.txt"
    fst.write_text("0 1 2 0.5\n1\n", encoding="utf-8")
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 decoding_mode="beam", beam_grammar_path=str(fst))
    pipe = AsrPipeline(model, params, vocab, cfg)
    assert pipe.beam_graph is not None
    assert trie_score(pipe.beam_graph, [2]) == pytest.approx(-0.5)
    assert pipe.beam_graph.next_state.shape[1] == model.config.vocab_size
