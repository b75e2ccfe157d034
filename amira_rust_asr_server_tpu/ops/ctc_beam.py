"""CTC prefix beam search — batched, jittable, grammar-aware.

Completes the CTC family's decode surface next to the transducer's beam
(ops/beam.py): the reference serves RNN-T-only with a k2 FST backend
(ref: k2_decoder_backend.cc), so a CTC beam is additive capability —
but it reuses the SAME weighted decoding-graph object (``TokenTrie``,
incl. OpenFST-text assets via ops/fst_io.py) and the same shallow-fusion
bias hook, so grammars written for one family constrain the other.

Algorithm: standard prefix beam search (Hannun et al. 2014) with the
(p_blank, p_non_blank) split per prefix:

    stay   (same prefix):  p_b' ⊕= (p_b ⊕ p_nb) + lp[blank]
                           p_nb' ⊕= p_nb + lp[last]        (no blank gap)
    extend (prefix + v):   p_nb' ⊕= (v == last ? p_b : p_b ⊕ p_nb) + lp[v]

TPU shape discipline: one ``lax.scan`` over frames; each tick expands
the K beam entries into K·(C+1) candidates (C = top-C tokens of the
frame posterior — in CTC the acoustics are prefix-independent, so one
``top_k`` serves every beam entry), then EXACTLY merges duplicate
prefixes with a [K', K'] pairwise-equality matrix + masked logsumexp
(two different paths reaching the same prefix must pool probability
mass — the correctness-critical step naive "keep K paths" decoders
skip), then prunes back to K by total score. All static shapes; padded
frames freeze the carry.

Grammar semantics mirror the transducer beam: an extension taking token
``v`` from trie state ``s`` requires ``next_state[s, v] >= 0``, adds
``arc_weight[s, v]``; at the end strict acceptance masks hypotheses in
non-final states and adds ``final_weight``. Repeats-without-blank stay
in place (one label = one arc, the CTC collapse rule).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .beam import TokenTrie

NEG_INF = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return jnp.where(m <= NEG_INF, NEG_INF,
                     m + jnp.log1p(jnp.exp(-jnp.abs(a - b))))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CtcBeamResult:
    tokens: jax.Array   # [B, K, L] int32, left-packed, blank-padded
    counts: jax.Array   # [B, K] int32
    scores: jax.Array   # [B, K] f32 total log-prob (+ graph/final weights)


def ctc_beam_decode(log_probs: jax.Array, logit_lens: jax.Array,
                    blank_id: int, *, width: int = 8,
                    cand: Optional[int] = None,
                    max_tokens: Optional[int] = None,
                    graph: Optional[TokenTrie] = None,
                    bias: Optional[jax.Array] = None,
                    strict: bool = True) -> CtcBeamResult:
    """Prefix beam search over frame posteriors.

    log_probs: [B, T, V] log-softmaxed frame posteriors
    logit_lens: [B] valid frame counts
    width: beam size K (hypotheses kept per frame)
    cand: tokens considered per frame (top-C of the posterior; default
        min(width, V-1); set V to make the search exact over the beam)
    max_tokens: label-length cap (default T — CTC can't emit more)
    graph: optional weighted decoding graph (TokenTrie)
    bias: optional [V] shallow-fusion log-bias added per emitted token
    strict: with a graph, reject hypotheses not in a final state
    """
    b, t_max, v = log_probs.shape
    k = width
    c = min(cand if cand is not None else width, v - 1)
    l_max = min(max_tokens or t_max, t_max)

    use_graph = graph is not None
    if use_graph:
        nxt_tab, arc_tab = graph.next_state, graph.arc_weight

    # beam state: tokens [B,K,L], count [B,K], p_b/p_nb [B,K],
    # trie state [B,K], accumulated graph+bias weight g [B,K]
    tokens0 = jnp.full((b, k, l_max), blank_id, jnp.int32)
    count0 = jnp.zeros((b, k), jnp.int32)
    # only entry 0 is live initially (empty prefix, p_b=0 ≡ prob 1)
    p_b0 = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_INF
                     ) * jnp.ones((b, 1))
    p_nb0 = jnp.full((b, k), NEG_INF)
    trie0 = jnp.zeros((b, k), jnp.int32)
    g0 = jnp.zeros((b, k), jnp.float32)

    kp = k * (c + 1)  # candidates per tick

    def tick(carry, inp):
        tokens, count, p_b, p_nb, trie, g = carry
        lp, t = inp                                    # lp [B, V]
        live = t < logit_lens                          # [B]

        # blank is never an extension (it feeds stay_pb), so mask it out
        # of the candidate top-k — otherwise a frame where blank ranks
        # high wastes a slot and leaks real-token mass (c = V-1 would not
        # be exact: measured 2.3e-3 nats lost on a 4-frame case)
        lp_ext = lp.at[:, blank_id].set(NEG_INF)
        top_lp, top_v = jax.lax.top_k(lp_ext, c)       # [B, C]
        last = jnp.take_along_axis(
            tokens, jnp.maximum(count - 1, 0)[..., None], axis=2
        )[..., 0]                                      # [B, K]
        has_last = count > 0
        lp_last = jnp.take_along_axis(lp, last, axis=1)  # [B, K]

        # -- stay candidates (one per beam entry): same prefix ----------
        stay_pb = _logaddexp(p_b, p_nb) + lp[:, None, blank_id]
        stay_pnb = jnp.where(has_last, p_nb + lp_last, NEG_INF)

        # -- extend candidates (K x C): prefix + v -----------------------
        vtok = top_v[:, None, :]                       # [B, 1, C]
        same = vtok == last[..., None]                 # [B, K, C]
        base = jnp.where(same, p_b[..., None],
                         _logaddexp(p_b, p_nb)[..., None])
        ext_pnb = base + top_lp[:, None, :]            # [B, K, C]
        # a blank in the top-C is never an extension (it feeds stay_pb)
        ok = (count[..., None] < l_max) & (vtok != blank_id)
        # graph transition: next_state[trie, v] — gather per (B,K,C)
        if use_graph:
            s_next = nxt_tab[trie[..., None],
                             jnp.broadcast_to(vtok, same.shape)]
            arc_w = arc_tab[trie[..., None],
                            jnp.broadcast_to(vtok, same.shape)]
            ok = ok & (s_next >= 0)
        else:
            s_next = jnp.zeros_like(same, jnp.int32)
            arc_w = jnp.zeros_like(base)
        bias_w = (bias[top_v][:, None, :] * jnp.ones_like(base)
                  if bias is not None else jnp.zeros_like(base))
        ext_pnb = jnp.where(ok, ext_pnb, NEG_INF)

        # -- assemble K' = K + K*C candidates -----------------------------
        # stays first (indices [0, K)), then extends flattened
        cand_tokens = jnp.concatenate(
            [tokens,
             jnp.repeat(tokens, c, axis=1)], axis=1)   # [B, K', L]
        ext_tok_flat = jnp.broadcast_to(vtok, same.shape
                                        ).reshape(b, k * c)
        ext_cnt = jnp.repeat(count, c, axis=1)         # pre-append counts
        write_pos = jnp.minimum(ext_cnt, l_max - 1)
        appended = jnp.take_along_axis(
            cand_tokens[:, k:], write_pos[..., None], axis=2)
        cand_tokens = cand_tokens.at[
            jnp.arange(b)[:, None], k + jnp.arange(k * c)[None, :],
            write_pos].set(jnp.where(ext_cnt < l_max, ext_tok_flat,
                                     appended[..., 0]))
        cand_count = jnp.concatenate(
            [count, jnp.where(ext_cnt < l_max, ext_cnt + 1, ext_cnt)],
            axis=1)
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((b, k * c), NEG_INF)], axis=1)
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(b, k * c)], axis=1)
        cand_trie = jnp.concatenate(
            [trie, s_next.reshape(b, k * c)], axis=1)
        cand_g = jnp.concatenate(
            [g, (g[..., None] + arc_w + bias_w).reshape(b, k * c)], axis=1)

        # -- exact duplicate-prefix merge ---------------------------------
        # identity = same length + same tokens; the first occurrence is
        # the representative, absorbing the others' (p_b, p_nb) mass
        eq_len = cand_count[:, :, None] == cand_count[:, None, :]
        eq_tok = jnp.all(
            (cand_tokens[:, :, None, :] == cand_tokens[:, None, :, :])
            | (jnp.arange(l_max)[None, None, None, :]
               >= cand_count[:, :, None, None]), axis=-1)
        # dead candidates never merge (their tokens are stale padding)
        alive = jnp.maximum(cand_pb, cand_pnb) > NEG_INF / 2
        eq = eq_len & eq_tok & alive[:, :, None] & alive[:, None, :]
        rep = jnp.argmax(eq, axis=2)                   # first equal index
        own = rep == jnp.arange(kp)[None, :]           # is representative
        mmask = rep[:, None, :] == jnp.arange(kp)[None, :, None]

        def pool(p):
            masked = jnp.where(mmask, p[:, None, :], NEG_INF)
            mx = jnp.max(masked, axis=2)
            pooled = mx + jnp.log(jnp.sum(
                jnp.where(mmask, jnp.exp(
                    jnp.maximum(p[:, None, :] - mx[..., None], -80.0)
                ) * (masked > NEG_INF / 2), 0.0), axis=2) + 1e-38)
            return jnp.where(own & (mx > NEG_INF / 2), pooled, NEG_INF)

        m_pb = pool(cand_pb)
        m_pnb = pool(cand_pnb)

        # -- prune to K by total score ------------------------------------
        total = _logaddexp(m_pb, m_pnb) + cand_g
        _, sel = jax.lax.top_k(total, k)               # [B, K]
        take = lambda a: jnp.take_along_axis(  # noqa: E731
            a, sel.reshape(b, k, *([1] * (a.ndim - 2))), axis=1)
        new = (take(cand_tokens), take(cand_count), take(m_pb),
               take(m_pnb), take(cand_trie), take(cand_g))

        # frozen past each lane's last frame
        out = tuple(jnp.where(
            live.reshape((b,) + (1,) * (n.ndim - 1)), n, o)
            for n, o in zip(new, carry))
        return out, None

    lps = jnp.swapaxes(log_probs, 0, 1)                # [T, B, V]
    carry = (tokens0, count0, p_b0, p_nb0, trie0, g0)
    (tokens, count, p_b, p_nb, trie, g), _ = jax.lax.scan(
        tick, carry, (lps, jnp.arange(t_max)))

    score = _logaddexp(p_b, p_nb) + g
    if use_graph:
        fin_ok = graph.is_final[trie] | (count == 0)
        score = score + jnp.where(count > 0, graph.final_weight[trie], 0.0)
        if strict:
            score = jnp.where(fin_ok, score, NEG_INF)
    order = jnp.argsort(-score, axis=1)
    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, order.reshape(b, k, *([1] * (a.ndim - 2))), axis=1)
    return CtcBeamResult(tokens=take(tokens),
                         counts=take(count).astype(jnp.int32),
                         scores=take(score))
