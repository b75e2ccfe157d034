"""Batched RNN-T beam search on device.

Capability parity with the reference's k2 Triton backend — GPU lattice
beam search with configurable beams and decoding-graph biasing
(ref: src/triton_backends/k2_decoder/k2_decoder_backend.cc:63-253) —
re-designed for TPU: instead of an FST intersection, a *time-synchronous
beam* over the transducer lattice, fully batched over (batch x beam) with
fixed label expansions per frame, so every step is dense MXU work
([B*K]-lane LSTM step + joint matmul, top-k over K*V candidates).

Algorithm (TSD with per-frame expansion cap, cf. the transducer
beam-search literature):
  for each frame t:
    C <- surviving hypotheses (the previous frame's blank pool)
    for s in 0..max_expansions-1:
      lp = log_softmax(joint(enc_t, C.pred_out)) (+ bias)
      * blank candidates C.score + lp[blank] finalize the frame ->
        merged into the frame's blank pool (top-K of pool U candidates)
      * label candidates C.score + lp[v] (v != blank): top-K over K*V
        become the next micro-step's C (prediction-net stepped on the
        chosen labels)
    next frame's hypotheses = blank pool
Hypothesis token strings are never shuffled on device: each micro-step
emits compact backtrace arrays (parent index + token), and the winning
path is reconstructed on host from [T, S, B, K] int32 arrays.

Biasing: an additive log-space bias vector over the vocabulary (shallow
fusion) built host-side from phrases (:func:`make_bias_vector`) — the
practical core of "lexicon-biased decoding" without shipping an FST.

Decoding-graph constraint (k2 parity): a lexicon/grammar compiles into a
device-resident :class:`TokenTrie` — a dense [n_states, V] transition
table in HBM — and beam label expansions are masked to trie-legal
continuations (the TPU-shaped equivalent of the k2 backend's
``IntersectDensePruned`` against a DECODING_GRAPH_PATH FST,
ref: k2_decoder_backend.cc:63-253: dense table lookups and masks instead
of sparse FST arc traversal, so every step stays vectorized). Composes
with the shallow-fusion bias.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_BEAM_WIDTH, MAX_TOTAL_TOKENS

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TokenTrie:
    """Dense device-resident WEIGHTED decoding graph over token ids.

    ``next_state[s, v]`` is the state reached from ``s`` by emitting token
    ``v`` (-1 = illegal transition); state 0 is the root. ``is_final[s]``
    marks states where a hypothesis may legally end. Weighted-FSA parity
    with k2 (the reference intersects a *weighted* FSA and ranks by total
    weight, ref: k2_decoder_backend.cc:63-253 IntersectDensePruned /
    ShortestPath): ``arc_weight[s, v]`` is the log-space weight added to a
    hypothesis when it takes that arc (shapes pruning DURING the search,
    like k2's intersection) and ``final_weight[s]`` is added when a
    hypothesis ends at state ``s`` (k2 final-arc weight). All-zero weights
    recover the boolean legality trie. Built host-side from a
    lexicon/grammar (:meth:`from_token_seqs`) or directly from dense
    tables (:meth:`from_tables`, arbitrary weighted-FSA topologies);
    with ``loop=True`` final states also accept the root's continuations
    (word-loop grammar) at the root's arc weights, baked into the table so
    the device kernel is a single gather.
    """

    next_state: jax.Array    # [N, V] int32
    is_final: jax.Array      # [N] bool
    arc_weight: jax.Array    # [N, V] float32 (log-space, 0 = unweighted)
    final_weight: jax.Array  # [N] float32

    @classmethod
    def from_token_seqs(cls, seqs, vocab_size: int, loop: bool = True,
                        weights: Optional[List[float]] = None,
                        final_weights: Optional[List[float]] = None
                        ) -> "TokenTrie":
        """Compile token sequences (each a legal phrase/word) to a trie.

        ``weights[i]`` (log-space, e.g. a unigram log-prob) is placed on
        the LAST arc of ``seqs[i]`` — the standard weighted-lexicon
        convention (cost realized when the word/phrase completes, so
        shared prefixes stay unweighted). When ``seqs[i]`` is a strict
        prefix of another sequence its last arc is an INTERIOR arc of the
        longer phrase, so placing the weight there would make the longer
        phrase collect both weights; such weights are realized as a
        completion weight on the final state instead (folded into
        ``final_weight``, and — with ``loop=True`` — onto the baked
        root-restart arcs, the epsilon-free closure of the exit arc).
        ``final_weights[i]`` lands on the sequence's final state.
        """
        children: List[dict] = [{}]   # node -> {token: child}
        final: List[bool] = [False]
        fin_w: List[float] = [0.0]
        ends: List[int] = []          # seqs[i] -> end node
        for i, seq in enumerate(seqs):
            node = 0
            for tok in seq:
                tok = int(tok)
                if tok not in children[node]:
                    children.append({})
                    final.append(False)
                    fin_w.append(0.0)
                    children[node][tok] = len(children) - 1
                node = children[node][tok]
            ends.append(node)
            if seq:
                final[node] = True
                if final_weights is not None:
                    fin_w[node] = float(final_weights[i])
        # second pass (structure is complete, so prefix-of-a-longer-phrase
        # end nodes are detectable by having children): assign sequence
        # weights; duplicates max-merge like an FSA union of weighted paths
        arc_w: List[dict] = [{} for _ in children]  # node -> {token: w}
        comp_w: List[Optional[float]] = [None] * len(children)
        if weights is not None:
            for i, seq in enumerate(seqs):
                if not seq:
                    continue
                w = float(weights[i])
                end = ends[i]
                if children[end]:
                    # last arc shared with a longer phrase's interior:
                    # realize at completion instead
                    prev = comp_w[end]
                    comp_w[end] = w if prev is None else max(prev, w)
                else:
                    # re-walk to the parent of the last arc
                    parent = 0
                    for tok in seq[:-1]:
                        parent = children[parent][int(tok)]
                    tok = int(seq[-1])
                    prev = arc_w[parent].get(tok)
                    arc_w[parent][tok] = w if prev is None else max(prev, w)
        for node, w in enumerate(comp_w):
            if w is not None:
                fin_w[node] += w
        n = len(children)
        table = np.full((n, vocab_size), -1, np.int32)
        wtable = np.zeros((n, vocab_size), np.float32)
        for node, ch in enumerate(children):
            for tok, nxt in ch.items():
                table[node, tok] = nxt
            for tok, w in arc_w[node].items():
                wtable[node, tok] = w
        if loop:
            # final states restart at the root: inherit root transitions
            # (and their arc weights) where the state has no continuation.
            # Restarting means the phrase ending at `node` completed, so the
            # restart arc also carries that state's final weight (the
            # epsilon-free closure of final-exit -> root).
            root_row = table[0]
            root_w = wtable[0]
            for node in range(1, n):
                if final[node]:
                    free = table[node] < 0
                    table[node, free] = root_row[free]
                    wtable[node, free] = root_w[free] + fin_w[node]
        return cls(next_state=jnp.asarray(table),
                   is_final=jnp.asarray(np.asarray(final)),
                   arc_weight=jnp.asarray(wtable),
                   final_weight=jnp.asarray(np.asarray(fin_w, np.float32)))

    @classmethod
    def from_tables(cls, next_state, is_final, arc_weight=None,
                    final_weight=None) -> "TokenTrie":
        """Arbitrary weighted-FSA topology from dense host tables."""
        next_state = np.asarray(next_state, np.int32)
        n, v = next_state.shape
        return cls(
            next_state=jnp.asarray(next_state),
            is_final=jnp.asarray(np.asarray(is_final, bool)),
            arc_weight=jnp.asarray(
                np.zeros((n, v), np.float32) if arc_weight is None
                else np.asarray(arc_weight, np.float32)),
            final_weight=jnp.asarray(
                np.zeros((n,), np.float32) if final_weight is None
                else np.asarray(final_weight, np.float32)))

    @classmethod
    def from_phrases(cls, vocab, phrases: List[str], vocab_size: int,
                     loop: bool = True,
                     weights: Optional[List[float]] = None) -> "TokenTrie":
        return cls.from_token_seqs(
            [vocab.encode_text(p) for p in phrases], vocab_size, loop=loop,
            weights=weights)

    @property
    def n_states(self) -> int:
        return self.next_state.shape[0]

    @property
    def weighted(self) -> bool:
        return bool(jnp.any(self.arc_weight != 0.0)
                    | jnp.any(self.final_weight != 0.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamTrace:
    """Device-side output of the beam scan; host reconstructs paths."""

    pool_scores: jax.Array     # [B, K] final hypothesis scores
    pool_lens: jax.Array       # [B, K] emitted-token counts
    exp_parent: jax.Array      # [T, S, B, K] parent hyp at each expansion
    exp_token: jax.Array       # [T, S, B, K] emitted token
    pool_parent_s: jax.Array   # [T, B, K] micro-step the pool entry ended at
    pool_parent_k: jax.Array   # [T, B, K] hyp index within that micro-step
    pool_final: jax.Array      # [B, K] hyp ends in a legal graph state
                               # (all-True when no graph constrains)


@dataclasses.dataclass
class BeamResult:
    tokens: np.ndarray   # [B, max_total] int32
    counts: np.ndarray   # [B] int32
    scores: np.ndarray   # [B] float32 (log prob of best hyp)
    n_best: Optional[List[List[Tuple[float, List[int]]]]] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamCarry:
    """Device-resident beam state carried across streaming chunks.

    Exactly the :func:`beam_decode` scan carry, so seeding a chunk from a
    ``BeamCarry`` continues the search bit-for-bit as if the chunks were
    one utterance (tests/test_beam_stream.py locks this equivalence) —
    the state-carry analogue of the greedy path's ``GreedyResult`` carry,
    and the parity-plus over the reference's batch-only k2 beam
    (ref: k2_decoder_backend.cc:63-253 decodes each request whole).
    Token histories stay on host (:func:`backtrace_carry` re-parents them
    each chunk); scores are cumulative log-probs and may be shifted by a
    per-lane constant between chunks (ranking-invariant) to keep f32
    headroom on long sessions.
    """

    scores: jax.Array     # [B, K] cumulative log-prob per hypothesis
    lens: jax.Array       # [B, K] emitted-token counts
    pred_out: jax.Array   # [B*K, P] prediction-net output (hyp-major)
    state: object         # pred-net state pytree, leaves [L, B*K, ...]
    last_token: jax.Array  # [B*K] last emitted token (blank at SOS)
    g_state: jax.Array    # [B, K] decoding-graph state (0 = root)


def beam_carry_init(pred_fn, init_state, blank_id: int, batch: int,
                    beam_width: int) -> BeamCarry:
    """Fresh beam carry for ``batch`` lanes: hypothesis 0 is the live
    empty hypothesis (score 0), the rest are -inf placeholders."""
    k = beam_width

    def bc(x):
        return jnp.repeat(x, k, axis=1)

    state = jax.tree_util.tree_map(bc, init_state)
    sos = jnp.full((batch * k,), blank_id, jnp.int32)
    pred_out, state = pred_fn(sos, state)
    return BeamCarry(
        scores=jnp.full((batch, k), NEG_INF).at[:, 0].set(0.0),
        lens=jnp.zeros((batch, k), jnp.int32),
        pred_out=pred_out, state=state, last_token=sos,
        g_state=jnp.zeros((batch, k), jnp.int32))


def beam_decode(pred_fn, joint_fn, enc: jax.Array, enc_lens: jax.Array,
                init_state, blank_id: int, *,
                beam_width: int = DEFAULT_BEAM_WIDTH,
                max_expansions: int = 3,
                bias: Optional[jax.Array] = None,
                vocab_size: Optional[int] = None,
                graph: Optional[TokenTrie] = None,
                init_beam: Optional[BeamCarry] = None,
                return_carry: bool = False):
    """Run the device-side beam scan. See module docstring.

    ``init_state`` leaves must be [L, B, ...] like greedy_decode's; they are
    broadcast to [L, B*K, ...] internally (hyp-major lanes).

    ``graph``: optional TokenTrie — label expansions are masked to
    trie-legal continuations and each hypothesis carries its graph state
    (k2 decoding-graph parity; blank/time-advance is always legal).

    ``init_beam``: resume the search from a carried :class:`BeamCarry`
    (streaming chunks) instead of the fresh single-empty-hypothesis
    start; ``init_state`` is ignored then. With ``return_carry=True``
    returns ``(trace, carry)`` where ``carry`` seeds the next chunk.
    """
    b, t_max, d_enc = enc.shape
    k = beam_width
    s_max = max_expansions
    enc_lens = enc_lens.astype(jnp.int32)

    if init_beam is None:
        init_beam = beam_carry_init(pred_fn, init_state, blank_id, b, k)
    state = init_beam.state
    pred_out = init_beam.pred_out
    scores0 = init_beam.scores
    lens0 = init_beam.lens
    last0 = init_beam.last_token
    g0 = init_beam.g_state
    bias_vec = (jnp.zeros((vocab_size,), jnp.float32)
                if bias is None else bias)

    def frame_step(carry, inputs):
        scores, lens, pred_out, state, last_tok, g_state = carry
        enc_t, t_idx = inputs                          # [B, D], scalar
        active = t_idx < enc_lens                      # [B]

        pool_scores = jnp.full((b, k), NEG_INF)
        pool_lens = jnp.zeros((b, k), jnp.int32)
        pool_ps = jnp.zeros((b, k), jnp.int32)
        pool_pk = jnp.tile(jnp.arange(k)[None, :], (b, 1))
        # pool states: filled by merges
        pool_pred = pred_out
        pool_state = state
        pool_last = last_tok
        pool_g = g_state

        exp_parents = []
        exp_tokens = []

        C = (scores, lens, pred_out, state, last_tok, g_state)
        pool = (pool_scores, pool_lens, pool_pred, pool_state, pool_last,
                pool_ps, pool_pk, pool_g)

        for s in range(s_max):
            (c_scores, c_lens, c_pred, c_state, c_last, c_g) = C
            (p_scores, p_lens, p_pred, p_state, p_last, p_ps, p_pk,
             p_g) = pool

            enc_lanes = jnp.repeat(enc_t, k, axis=0)   # [B*K, D]
            logits = joint_fn(enc_lanes, c_pred)       # [B*K, V]
            v = logits.shape[-1]
            lp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
            lp = lp + bias_vec[None, None, :]
            # bias must not touch blank probability
            lp = lp.at[:, :, blank_id].add(-bias_vec[blank_id])

            # ---- blank candidates -> merge into pool -------------------
            blank_cand = c_scores + lp[:, :, blank_id]          # [B, K]
            blank_cand = jnp.where(active[:, None], blank_cand, NEG_INF)
            # inactive lanes: at s=0 pass hyps through unchanged
            if s == 0:
                passthrough = jnp.where(active[:, None], NEG_INF, c_scores)
                blank_cand = jnp.maximum(blank_cand, passthrough)

            merged = jnp.concatenate([p_scores, blank_cand], axis=1)
            top_scores, top_idx = jax.lax.top_k(merged, k)      # [B, K]
            from_pool = top_idx < k                              # [B, K]
            cand_k = jnp.where(from_pool, top_idx, top_idx - k)

            def sel2(pool_x, c_x):
                # gather along hyp axis for [B, K] leaves
                return jnp.where(
                    from_pool,
                    jnp.take_along_axis(pool_x, cand_k, axis=1),
                    jnp.take_along_axis(c_x, cand_k, axis=1))

            def sel_lanes(pool_x, c_x):
                # [L, B*K, ...] or [B*K, ...] leaves: gather lanes
                def to_bk(x):
                    return x  # lanes already b*K major
                flat_idx = (jnp.arange(b)[:, None] * k + cand_k).reshape(-1)
                if pool_x.ndim >= 2 and pool_x.shape[0] not in (b * k,):
                    # [L, B*K, ...]
                    g_pool = pool_x[:, flat_idx]
                    g_c = c_x[:, flat_idx]
                    mask = from_pool.reshape(-1)
                    mshape = [1, b * k] + [1] * (pool_x.ndim - 2)
                    return jnp.where(mask.reshape(mshape), g_pool, g_c)
                g_pool = pool_x[flat_idx]
                g_c = c_x[flat_idx]
                mask = from_pool.reshape(-1)
                mshape = [b * k] + [1] * (pool_x.ndim - 1)
                return jnp.where(mask.reshape(mshape), g_pool, g_c)

            new_p_scores = top_scores
            new_p_lens = sel2(p_lens, c_lens)
            new_p_ps = jnp.where(
                from_pool, jnp.take_along_axis(p_ps, cand_k, axis=1), s)
            new_p_pk = jnp.where(
                from_pool, jnp.take_along_axis(p_pk, cand_k, axis=1),
                cand_k)
            new_p_pred = sel_lanes(p_pred, c_pred)
            new_p_state = jax.tree_util.tree_map(sel_lanes, p_state, c_state)
            new_p_last = sel_lanes(p_last, c_last)
            new_p_g = sel2(p_g, c_g)
            pool = (new_p_scores, new_p_lens, new_p_pred, new_p_state,
                    new_p_last, new_p_ps, new_p_pk, new_p_g)

            # ---- label expansions -> next micro-step C -----------------
            lab = lp.at[:, :, blank_id].set(NEG_INF)
            if graph is not None:
                # decoding-graph constraint: only trie-legal continuations,
                # with the arc's graph weight added (weighted-FSA parity:
                # k2's intersection sums acoustic + graph arc scores, so
                # weights shape pruning during the search, not just the
                # final ranking)
                legal = graph.next_state[c_g] >= 0          # [B, K, V]
                lab = jnp.where(legal, lab + graph.arc_weight[c_g], NEG_INF)
            cand = c_scores[:, :, None] + lab                   # [B, K, V]
            cand = jnp.where(active[:, None, None], cand, NEG_INF)
            flat = cand.reshape(b, k * v)
            e_scores, e_idx = jax.lax.top_k(flat, k)            # [B, K]
            parent = (e_idx // v).astype(jnp.int32)
            token = (e_idx % v).astype(jnp.int32)

            flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
            par_state = jax.tree_util.tree_map(
                lambda x: x[:, flat_parent] if x.ndim >= 2
                and x.shape[0] != b * k else x[flat_parent], c_state)
            new_pred, new_state = pred_fn(token.reshape(-1), par_state)

            new_lens = jnp.take_along_axis(c_lens, parent, axis=1) + 1
            if graph is not None:
                g_parent = jnp.take_along_axis(c_g, parent, axis=1)
                new_g = graph.next_state[g_parent, token]
                # illegal candidates score NEG_INF and never win; clamp
                # their state so downstream gathers stay in bounds
                new_g = jnp.maximum(new_g, 0)
            else:
                new_g = c_g
            C = (e_scores, new_lens, new_pred, new_state, token.reshape(-1),
                 new_g)

            exp_parents.append(parent)
            exp_tokens.append(token)

        (p_scores, p_lens, p_pred, p_state, p_last, p_ps, p_pk, p_g) = pool
        out = (jnp.stack(exp_parents), jnp.stack(exp_tokens), p_ps, p_pk)
        return (p_scores, p_lens, p_pred, p_state, p_last, p_g), out

    t_indices = jnp.arange(t_max)
    enc_tb = jnp.swapaxes(enc, 0, 1)                   # [T, B, D]
    init = (scores0, lens0, pred_out, state, last0, g0)
    ((scores_f, lens_f, pred_f, state_f, last_f, g_f),
     (exp_parent, exp_token, pool_ps, pool_pk)) = \
        jax.lax.scan(frame_step, init, (enc_tb, t_indices))

    raw_scores = scores_f
    if graph is not None:
        # strict FSA acceptance (k2 parity): the empty hypothesis is final
        # only if the start state is — otherwise a confident model's
        # all-blank path would outrank every real grammar completion.
        # backtrace()'s uniform demotion still returns the least-bad
        # incomplete path (e.g. empty on silence) when nothing accepts.
        pool_final = graph.is_final[g_f] | (
            (lens_f == 0) & graph.is_final[0])
        # k2 final-weight parity: a hypothesis ending at a final state
        # collects that state's final weight in its total score
        scores_f = scores_f + jnp.where(
            graph.is_final[g_f] & (lens_f > 0), graph.final_weight[g_f], 0.0)
    else:
        pool_final = jnp.ones((b, k), bool)
    trace = BeamTrace(pool_scores=scores_f, pool_lens=lens_f,
                      exp_parent=exp_parent, exp_token=exp_token,
                      pool_parent_s=pool_ps, pool_parent_k=pool_pk,
                      pool_final=pool_final)
    if return_carry:
        # raw scores WITHOUT the final-weight adjustment: finality is an
        # end-of-utterance judgement, the carried search is mid-stream
        carry = BeamCarry(scores=raw_scores, lens=lens_f, pred_out=pred_f,
                          state=state_f, last_token=last_f, g_state=g_f)
        return trace, carry
    return trace


# ---------------------------------------------------------------------------
def backtrace(trace: BeamTrace, enc_lens: np.ndarray, *,
              length_penalty: float = 0.0,
              max_total: int = MAX_TOTAL_TOKENS,
              n_best: int = 1) -> BeamResult:
    """Host-side path reconstruction from the device trace."""
    pool_scores = np.asarray(trace.pool_scores)
    pool_lens = np.asarray(trace.pool_lens)
    exp_parent = np.asarray(trace.exp_parent)   # [T, S, B, K]
    exp_token = np.asarray(trace.exp_token)
    pool_ps = np.asarray(trace.pool_parent_s)   # [T, B, K]
    pool_pk = np.asarray(trace.pool_parent_k)
    enc_lens = np.asarray(enc_lens)
    # graph-final constraint: hypotheses stranded mid-word/mid-phrase rank
    # below every complete one (uniform demotion keeps relative order as a
    # fallback when no hypothesis reached a final state)
    pool_final = np.asarray(trace.pool_final)
    pool_scores = np.where(pool_final, pool_scores, pool_scores - 1e12)

    b, k = pool_scores.shape
    tokens_out = np.zeros((b, max_total), np.int32)
    counts = np.zeros((b,), np.int32)
    best_scores = np.zeros((b,), np.float32)
    all_nbest: List[List[Tuple[float, List[int]]]] = []

    for i in range(b):
        t_last = int(enc_lens[i]) - 1
        # rank hyps with optional length normalization
        lengths = np.maximum(pool_lens[i], 1)
        ranked = pool_scores[i] / (lengths ** length_penalty) \
            if length_penalty > 0 else pool_scores[i]
        order = np.argsort(-ranked)
        lane_nbest: List[Tuple[float, List[int]]] = []
        for rank in range(min(n_best, k)):
            hyp = int(order[rank])
            if pool_scores[i, hyp] <= NEG_INF / 2:
                continue
            seq: List[int] = []
            t, kk = t_last, hyp
            while t >= 0:
                s = int(pool_ps[t, i, kk])
                kk2 = int(pool_pk[t, i, kk])
                # walk micro-steps s..1 collecting emissions
                while s > 0:
                    seq.append(int(exp_token[t, s - 1, i, kk2]))
                    kk2 = int(exp_parent[t, s - 1, i, kk2])
                    s -= 1
                kk = kk2
                t -= 1
            seq.reverse()
            lane_nbest.append((float(pool_scores[i, hyp]), seq))
        if not lane_nbest:
            lane_nbest.append((float(pool_scores[i, order[0]]), []))
        all_nbest.append(lane_nbest)
        score, seq = lane_nbest[0]
        n = min(len(seq), max_total)
        tokens_out[i, :n] = seq[:n]
        counts[i] = n
        best_scores[i] = score

    return BeamResult(tokens=tokens_out, counts=counts, scores=best_scores,
                      n_best=all_nbest if n_best > 1 else None)


def backtrace_carry(trace: BeamTrace, enc_lens: np.ndarray
                    ) -> Tuple[np.ndarray, List[List[List[int]]]]:
    """Host-side re-parenting for streaming chunks: for EVERY pool
    hypothesis, the chunk-local emissions and which chunk-START hypothesis
    it descends from.

    Returns ``(origins [B, K] int32, seqs[b][k] token lists)``: carried
    token history after the chunk is ``hist2[k] = hist[origins[b, k]] +
    seqs[b][k]``. No graph-finality demotion — mid-stream hypotheses are
    legitimately mid-phrase; finality is judged once at end-of-stream by
    :func:`backtrace`.
    """
    exp_parent = np.asarray(trace.exp_parent)   # [T, S, B, K]
    exp_token = np.asarray(trace.exp_token)
    pool_ps = np.asarray(trace.pool_parent_s)   # [T, B, K]
    pool_pk = np.asarray(trace.pool_parent_k)
    enc_lens = np.asarray(enc_lens)
    b, k = trace.pool_scores.shape
    origins = np.zeros((b, k), np.int32)
    seqs: List[List[List[int]]] = []
    for i in range(b):
        lane: List[List[int]] = []
        for hyp in range(k):
            seq: List[int] = []
            t, kk = int(enc_lens[i]) - 1, hyp
            while t >= 0:
                s = int(pool_ps[t, i, kk])
                kk2 = int(pool_pk[t, i, kk])
                while s > 0:
                    seq.append(int(exp_token[t, s - 1, i, kk2]))
                    kk2 = int(exp_parent[t, s - 1, i, kk2])
                    s -= 1
                kk = kk2
                t -= 1
            seq.reverse()
            origins[i, hyp] = kk
            lane.append(seq)
        seqs.append(lane)
    return origins, seqs


# ---------------------------------------------------------------------------
def beam_decode_transducer(model, params, enc, enc_lens, *,
                           beam_width: int = DEFAULT_BEAM_WIDTH,
                           max_expansions: int = 3,
                           bias: Optional[jax.Array] = None,
                           graph: Optional[TokenTrie] = None,
                           length_penalty: float = 0.0,
                           n_best: int = 1) -> BeamResult:
    """Beam search bound to a Transducer model."""
    cfg = model.config
    # same enc-projection hoist as the greedy path
    enc = model.joint_precompute_enc(params, enc)
    trace = beam_decode(
        partial(model.predict_step, params),
        partial(model.joint_step_pre, params),
        enc, enc_lens, model.init_state(enc.shape[0], dtype=enc.dtype),
        cfg.blank_id, beam_width=beam_width,
        max_expansions=max_expansions, bias=bias,
        vocab_size=cfg.vocab_size, graph=graph)
    return backtrace(trace, np.asarray(enc_lens),
                     length_penalty=length_penalty, n_best=n_best)


def make_bias_vector(vocab, phrases: List[str], boost: float,
                     vocab_size: int) -> jnp.ndarray:
    """Shallow-fusion bias: boost tokens whose surface form appears in any
    bias phrase (lexicon biasing over vocab.txt — the TPU-side analogue of
    the k2 backend's decoding-graph parameter)."""
    bias = np.zeros((vocab_size,), np.float32)
    norm_phrases = [" " + p.lower().strip() + " " for p in phrases]
    for tok_id in range(vocab_size):
        tok = vocab.get_token(tok_id)
        if not tok:
            continue
        surface = tok.replace("▁", " ").lower()
        if len(surface.strip()) == 0:
            continue
        if any(surface in p for p in norm_phrases):
            bias[tok_id] = boost
    return jnp.asarray(bias)
