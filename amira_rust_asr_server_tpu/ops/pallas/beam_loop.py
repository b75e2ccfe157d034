"""The WHOLE RNN-T time-synchronous beam scan as ONE persistent Pallas
kernel.

The XLA beam (ops/beam.py) is exact but latency-bound: T' * S sequential
micro-steps, each a handful of small HLO ops (joint matmul, log-softmax,
two top-k, lane gathers, LSTM step) that re-stream the ~15 MB
prediction/joint weights from HBM and pay per-op scheduling latency —
measured ~123 ms for the flagship 16x30 s batch vs a ~12 ms weight/FLOP
floor. Same cure as the greedy loop (decode_loop.py): run the entire scan
inside one kernel with every decode-path weight and the precomputed
encoder projection VMEM-resident.

Semantics are exactly ops/beam.beam_decode's: TSD with per-frame
expansion cap, pool merge with first-index tie-breaking, inactive-lane
passthrough at s=0, additive shallow-fusion bias that never touches
blank, compact backtrace arrays, and (graph given) weighted decoding-
graph constraint — legality masks + arc weights from two VMEM-resident
[Np, Vp] trie tables, per-hypothesis graph state advanced by one-hot
matmul gathers; finality/final-weights are applied by the caller from
the returned g_f (ref behavior being beaten: the k2 lattice decoder,
src/triton_backends/k2_decoder/k2_decoder_backend.cc:63-253).
Equivalence is locked by tests/test_pallas_beam_loop.py (interpret mode,
f32, bit-exact vs the XLA scan, constrained + unconstrained) and
exercised on hardware by bench/selfcheck A/Bs. FSAs past
~1k states route to the XLA gather path (pipeline.PALLAS_GRAPH_MAX_STATES).

Mosaic techniques (all probed on hardware before this was written):
  - bookkeeping lives as [B, K] tiles, lane-major state as [B*K, X];
    matmul/select bridges move between the layouts (Mosaic rejects
    vector reshapes that merge the sublane dim into lanes);
  - every top-k is k passes of (max, min-index-of-max) — the min-index
    reduce reproduces XLA top_k's first-index tie-break exactly, which
    matters structurally (dead hypotheses tie at NEG_INF constantly);
  - all gathers are one-hot matmuls (no dynamic slicing): lane
    permutations as [BK, BK] boolean matmuls, per-row scalar broadcast
    as a [BK, B] group-selector matmul;
  - the flat top-k over K*V candidates never materializes [B, K*V]:
    per-row (max, argmax) over [BK, Vp] then a K-wide reduce picks
    (parent, token), and the winning cell is masked via an outer-product
    one-hot. Selection order equals flat first-index order: equal values
    resolve to the smallest parent, then the smallest column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import VOCAB_PAD, pad_joint_params

NEG_INF = -1e30


def _dot(a, b):
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _qdot(x32, wq_ref, ws_ref):
    """W8A8 matmul for the int8-resident quant path (same scheme as
    decode_loop._qdot): per-row activation quant -> int8 MXU dot ->
    fused per-output-channel dequant."""
    s = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.round(x32 / s).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * ws_ref[0, :][None, :])


def _make_kernel(b: int, k: int, t_max: int, s_max: int, vp: int,
                 blank_id: int, n_states: int = 0, quant: bool = False):
    """n_states > 0 compiles the decoding-graph-constrained variant:
    two extra VMEM-resident [Np, VP] tables (next-state ids as f32, arc
    weights) and a per-hypothesis graph state; all graph lookups are
    one-hot matmuls (k2 decoding-graph parity at kernel speed).
    ``quant``: LSTM weights arrive int8, split at the x/h boundary
    (see decode_loop._make_kernel)."""
    bk = b * k

    def kernel(enc_ref, enc_lens_ref, h0_ref, c0_ref, bias_ref,
               embed_ref, *weights_and_rest):
        if quant:
            (wx0_ref, sx0_ref, wh0_ref, sh0_ref, bl0_ref,
             wx1_ref, sx1_ref, wh1_ref, sh1_ref, bl1_ref,
             wp_ref, bp_ref, wo_ref, bo_ref, *rest) = weights_and_rest
        else:
            (wl0_ref, bl0_ref, wl1_ref, bl1_ref,
             wp_ref, bp_ref, wo_ref, bo_ref, *rest) = weights_and_rest
        if n_states:
            nxt_ref, aw_ref = rest[0], rest[1]
            (scores_ref, lens_ref, expp_ref, expt_ref, pps_ref, ppk_ref,
             gf_ref) = rest[2:]
        else:
            (scores_ref, lens_ref, expp_ref, expt_ref, pps_ref,
             ppk_ref) = rest
        enc_lens = enc_lens_ref[:, 0]                     # [B] i32
        dt = embed_ref.dtype

        row = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)[:, 0]  # [BK]
        kpos = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)        # [B,K]
        k2pos = jax.lax.broadcasted_iota(jnp.int32, (b, 2 * k), 1)
        colv = jax.lax.broadcasted_iota(jnp.int32, (bk, vp), 1)
        # group selector: boh[r, j] = (j == r // k), for per-b -> per-lane
        # broadcast as a matmul
        boh = (jax.lax.broadcasted_iota(jnp.int32, (bk, b), 1)
               == (row // k)[:, None]).astype(jnp.float32)
        blank_col = colv == blank_id                      # [BK, VP]
        bias_row = bias_ref[0, :]                         # [VP] f32
        bias_blank = jnp.sum(
            jnp.where(jax.lax.broadcasted_iota(
                jnp.int32, (1, vp), 1)[0] == blank_id, bias_row, 0.0))

        # Layout bridges between [B, K] bookkeeping and [BK] lane-major
        # vectors. Mosaic rejects sublane-merging vector reshapes, AND the
        # TPU compiler SIGABRTs on >8 single-sublane/single-lane matmuls
        # per loop body (bisected on hardware) — so every bridge is ONE
        # well-shaped matmul plus elementwise masks.
        kpos_bk = jax.lax.broadcasted_iota(jnp.int32, (bk, k), 1)
        rmod = (row % k)[:, None]                          # [BK, 1]
        gsel = (jax.lax.broadcasted_iota(jnp.int32, (b, bk), 1) // k
                == jax.lax.broadcasted_iota(jnp.int32, (b, bk), 0)
                ).astype(jnp.float32)                      # [B, BK]

        def flatten_bk(x):
            """[B, K] -> [BK] with lane r = (r//K, r%K). f32-exact ints OK."""
            w = _dot(boh, x.astype(jnp.float32))           # [BK, K]
            return jnp.sum(jnp.where(kpos_bk == rmod, w, 0.0), axis=-1)

        def flatten_bk_i(x):
            return flatten_bk(x.astype(jnp.float32)).astype(jnp.int32)

        def unflatten_bk(x):
            """[BK] f32 -> [B, K] (one group-selector matmul)."""
            xm = jnp.where(kpos_bk == rmod,
                           x.astype(jnp.float32)[:, None], 0.0)  # [BK, K]
            return _dot(gsel, xm)                          # [B, K]

        def bcast_b(x):
            """[B] f32 -> [BK] (per-group broadcast)."""
            x2 = x.astype(jnp.float32)[:, None] + jnp.zeros(
                (b, k), jnp.float32)
            return flatten_bk(x2)

        def lane_gather(g, x):
            """x [BK, X], g [BK] i32 -> x[g] (one-hot matmul gather)."""
            oh = (jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
                  == g[:, None]).astype(jnp.float32)
            return _dot(oh, x.astype(jnp.float32))

        def gather_bk(src, idx):
            """src [B,K], idx [B,K] -> src[b, idx[b,j]] (unrolled, K small)."""
            cols = []
            for j in range(k):
                hit = kpos == idx[:, j:j + 1]
                cols.append(jnp.sum(jnp.where(hit, src, 0), axis=-1))
            return jnp.stack(cols, axis=-1)               # [B, K]

        def amax_first(x, size):
            """(max, first-index-of-max) along the last axis."""
            m = jnp.max(x, axis=-1)
            pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
            i = jnp.min(jnp.where(x == m[..., None], pos, size), axis=-1)
            return m, i.astype(jnp.int32)

        def pred_lstm(fed, h0, h1, c0, c1):
            """fed [BK] i32 -> (pred_out [BK,P] dt, h0',h1',c0',c1')."""
            oh = (colv == fed[:, None]) & (fed != blank_id)[:, None]
            x = _dot(oh.astype(dt), embed_ref[:]).astype(dt)    # [BK, E]
            if quant:
                g = (_qdot(x.astype(jnp.float32), wx0_ref, sx0_ref)
                     + _qdot(h0.astype(jnp.float32), wh0_ref, sh0_ref)
                     + bl0_ref[0, :])
            else:
                xh = jnp.concatenate([x, h0], axis=-1)
                g = _dot(xh, wl0_ref[:]) + bl0_ref[0, :]
            i0, f0, g0, o0 = jnp.split(g, 4, axis=-1)
            c0n = (jax.nn.sigmoid(f0 + 1.0) * c0.astype(jnp.float32)
                   + jax.nn.sigmoid(i0) * jnp.tanh(g0))
            h0n = jax.nn.sigmoid(o0) * jnp.tanh(c0n)
            if quant:
                g1 = (_qdot(h0n, wx1_ref, sx1_ref)
                      + _qdot(h1.astype(jnp.float32), wh1_ref, sh1_ref)
                      + bl1_ref[0, :])
            else:
                xh1 = jnp.concatenate([h0n.astype(dt), h1], axis=-1)
                g1 = _dot(xh1, wl1_ref[:]) + bl1_ref[0, :]
            i1, f1, g1g, o1 = jnp.split(g1, 4, axis=-1)
            c1n = (jax.nn.sigmoid(f1 + 1.0) * c1.astype(jnp.float32)
                   + jax.nn.sigmoid(i1) * jnp.tanh(g1g))
            h1n = jax.nn.sigmoid(o1) * jnp.tanh(c1n)
            return (h1n.astype(dt), h0n.astype(dt), h1n.astype(dt),
                    c0n.astype(dt), c1n.astype(dt))

        # SOS step (XLA: pred_fn(sos, state) before the scan)
        sos = jnp.full((bk,), blank_id, jnp.int32)
        pred0, h0i, h1i, c0i, c1i = pred_lstm(
            sos, h0_ref[0], h0_ref[1], c0_ref[0], c0_ref[1])

        scores0 = jnp.where(kpos == 0, 0.0, NEG_INF)      # [B, K]
        lens0 = jnp.zeros((b, k), jnp.int32)
        zero_tbk = jnp.zeros((t_max, bk), jnp.int32)
        trow = jax.lax.broadcasted_iota(jnp.int32, (t_max, bk), 0)

        def frame(t, carry):
            (scores, lens, pred_out, h0, h1, c0, c1, g_in,
             expp, expt, pps, ppk) = carry
            active = t < enc_lens                          # [B]
            active_bk = bcast_b(active.astype(jnp.float32)) > 0.5

            # enc row for frame t, straight to lanes: ONE block-diagonal
            # one-hot matmul over the pre-flattened [B*T, Dj] input (the
            # per-lane [1, T] x [T, Dj] form SIGABRTs the TPU compiler at
            # B >= ~16 tiny matmuls per body — bisected on hardware)
            oh_bt = (jax.lax.broadcasted_iota(
                jnp.int32, (bk, b * t_max), 1)
                == ((row // k) * t_max + t)[:, None]).astype(enc_ref.dtype)
            enc_bk = _dot(oh_bt, enc_ref[:])               # [BK, Dj] f32

            # pool init (frame-start mirror of C)
            p_scores = jnp.full((b, k), NEG_INF)
            p_lens = jnp.zeros((b, k), jnp.int32)
            p_ps = jnp.zeros((b, k), jnp.int32)
            p_pk = kpos
            p_pred, p_h0, p_h1, p_c0, p_c1 = (
                pred_out, h0, h1, c0, c1)
            c_scores, c_lens = scores, lens
            c_pred, c_h0, c_h1, c_c0, c_c1 = (
                pred_out, h0, h1, c0, c1)
            p_g = g_in                                     # [BK, 1] f32
            c_g = g_in
            step_parents = []
            step_tokens = []

            for s in range(s_max):
                # -- joint + log-softmax + bias --------------------------
                pj = _dot(c_pred, wp_ref[:]) + bp_ref[0, :]      # [BK,J]f32
                hid = jnp.maximum(enc_bk + pj, 0.0)
                logits = _dot(hid.astype(dt), wo_ref[:]) + bo_ref[0, :]
                m = jnp.max(logits, axis=-1)
                lse = m + jnp.log(jnp.sum(
                    jnp.exp(logits - m[:, None]), axis=-1))
                lp = logits - lse[:, None]                       # [BK, VP]
                lp = lp + bias_row[None, :]
                lp = jnp.where(blank_col, lp - bias_blank, lp)

                scores_bk = flatten_bk(c_scores)
                lp_blank = jnp.sum(jnp.where(blank_col, lp, 0.0), axis=-1)

                # -- blank candidates -> pool merge ----------------------
                blank_cand = jnp.where(active_bk,
                                       scores_bk + lp_blank, NEG_INF)
                if s == 0:
                    passthrough = jnp.where(active_bk, NEG_INF, scores_bk)
                    blank_cand = jnp.maximum(blank_cand, passthrough)
                merged = jnp.concatenate(
                    [p_scores, unflatten_bk(blank_cand)], axis=-1)
                top_s, top_i = [], []
                for _ in range(k):
                    mv, mi = amax_first(merged, 2 * k)
                    top_s.append(mv)
                    top_i.append(mi)
                    merged = jnp.where(k2pos == mi[:, None], -jnp.inf,
                                       merged)
                top_scores = jnp.stack(top_s, axis=-1)           # [B, K]
                top_idx = jnp.stack(top_i, axis=-1)
                from_pool = top_idx < k
                cand_k = jnp.where(from_pool, top_idx, top_idx - k)

                new_p_lens = jnp.where(from_pool,
                                       gather_bk(p_lens, cand_k),
                                       gather_bk(c_lens, cand_k))
                new_p_ps = jnp.where(from_pool,
                                     gather_bk(p_ps, cand_k), s)
                new_p_pk = jnp.where(from_pool,
                                     gather_bk(p_pk, cand_k), cand_k)
                g_lane = flatten_bk_i(cand_k) + (row // k) * k   # [BK]
                fp_bk = (flatten_bk(from_pool.astype(jnp.float32)) > 0.5)[:, None]

                def sel(p_x, c_x):
                    return jnp.where(
                        fp_bk, lane_gather(g_lane, p_x),
                        lane_gather(g_lane, c_x)).astype(p_x.dtype)

                new_p_pred = sel(p_pred, c_pred)
                new_p_h0 = sel(p_h0, c_h0)
                new_p_h1 = sel(p_h1, c_h1)
                new_p_c0 = sel(p_c0, c_c0)
                new_p_c1 = sel(p_c1, c_c1)
                new_p_g = sel(p_g, c_g)
                (p_scores, p_lens, p_ps, p_pk, p_pred, p_h0, p_h1,
                 p_c0, p_c1, p_g) = (
                    top_scores, new_p_lens, new_p_ps, new_p_pk, new_p_pred,
                    new_p_h0, new_p_h1, new_p_c0, new_p_c1, new_p_g)

                # -- label expansions -> next micro-step C ---------------
                lab = jnp.where(blank_col, NEG_INF, lp)
                if n_states:
                    # graph legality + arc weights: gather each hyp's trie
                    # row with a one-hot matmul (k2 intersection: acoustic
                    # + graph arc scores shape the pruning)
                    oh_g = (jax.lax.broadcasted_iota(
                        jnp.int32, (bk, n_states), 1)
                        == c_g[:, 0].astype(jnp.int32)[:, None]
                        ).astype(jnp.float32)
                    nxt_rows = _dot(oh_g, nxt_ref[:])      # [BK, VP] f32
                    aw_rows = _dot(oh_g, aw_ref[:])        # [BK, VP] f32
                    lab = jnp.where(nxt_rows >= 0.0, lab + aw_rows,
                                    NEG_INF)
                cand = jnp.where(active_bk[:, None],
                                 scores_bk[:, None] + lab, NEG_INF)
                e_s, e_par, e_tok = [], [], []
                for _ in range(k):
                    m_row, c_row = amax_first(cand, vp)          # [BK]
                    m2 = unflatten_bk(m_row)
                    mb, kstar = amax_first(m2, k)                # [B]
                    khit = kpos == kstar[:, None]
                    cstar = jnp.sum(
                        jnp.where(khit, unflatten_bk(c_row).astype(jnp.int32), 0), axis=-1)
                    e_s.append(mb)
                    e_par.append(kstar)
                    e_tok.append(cstar)
                    kstar_r = bcast_b(kstar.astype(jnp.float32))
                    cstar_r = bcast_b(cstar.astype(jnp.float32))
                    hit = (((row % k).astype(jnp.float32)[:, None]
                            == kstar_r[:, None])
                           & (colv.astype(jnp.float32)
                              == cstar_r[:, None]))
                    cand = jnp.where(hit, -jnp.inf, cand)
                e_scores = jnp.stack(e_s, axis=-1)               # [B, K]
                parent = jnp.stack(e_par, axis=-1).astype(jnp.int32)
                token = jnp.stack(e_tok, axis=-1).astype(jnp.int32)

                g_par = flatten_bk_i(parent) + (row // k) * k
                par_h0 = lane_gather(g_par, c_h0).astype(dt)
                par_h1 = lane_gather(g_par, c_h1).astype(dt)
                par_c0 = lane_gather(g_par, c_c0).astype(dt)
                par_c1 = lane_gather(g_par, c_c1).astype(dt)
                tok_bk = flatten_bk_i(token)
                new_pred, nh0, nh1, nc0, nc1 = pred_lstm(
                    tok_bk, par_h0, par_h1, par_c0, par_c1)
                new_lens = gather_bk(c_lens, parent) + 1
                if n_states:
                    # advance graph state: parent's trie row, column
                    # `token` (one-hot column select); illegal winners
                    # never happen (NEG_INF), clamp keeps gathers in range
                    rows_par = lane_gather(g_par, nxt_rows)  # [BK, VP]
                    newg = jnp.sum(jnp.where(
                        colv == tok_bk[:, None], rows_par, 0.0), axis=-1)
                    c_g = jnp.maximum(newg, 0.0)[:, None]    # [BK, 1]
                (c_scores, c_lens, c_pred, c_h0, c_h1, c_c0,
                 c_c1) = (e_scores, new_lens, new_pred, nh0, nh1, nc0, nc1)
                step_parents.append(flatten_bk_i(parent))
                step_tokens.append(flatten_bk_i(token))

            # record this frame's backtrace rows
            t_hit = trow == t
            for s in range(s_max):
                expp[s] = jnp.where(t_hit, step_parents[s][None, :],
                                    expp[s])
                expt[s] = jnp.where(t_hit, step_tokens[s][None, :],
                                    expt[s])
            pps = jnp.where(t_hit, flatten_bk_i(p_ps)[None, :], pps)
            ppk = jnp.where(t_hit, flatten_bk_i(p_pk)[None, :], ppk)

            return (p_scores, p_lens, p_pred, p_h0, p_h1, p_c0, p_c1,
                    p_g, expp, expt, pps, ppk)

        init = (scores0, lens0, pred0, h0i, h1i, c0i, c1i,
                jnp.zeros((bk, 1), jnp.float32),
                [zero_tbk] * s_max, [zero_tbk] * s_max, zero_tbk, zero_tbk)
        (scores_f, lens_f, *_rest, g_f, expp, expt, pps, ppk) = \
            jax.lax.fori_loop(0, t_max, frame, init)

        scores_ref[:] = scores_f
        lens_ref[:] = lens_f
        for s in range(s_max):
            expp_ref[s] = expp[s]
            expt_ref[s] = expt[s]
        pps_ref[:] = pps
        ppk_ref[:] = ppk
        if n_states:
            gf_ref[:] = unflatten_bk(g_f[:, 0]).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "max_expansions", "blank_id",
                     "interpret"))
def beam_loop_pallas(enc_pre: jax.Array, enc_lens: jax.Array,
                     init_h: jax.Array, init_c: jax.Array,
                     bias: jax.Array, pred_params, joint_params,
                     pred_quant=None, *,
                     beam_width: int, max_expansions: int, blank_id: int,
                     graph=None, interpret: bool = False):
    """Whole-beam-scan kernel.

    enc_pre [B, T', d_joint] (joint_precompute_enc output),
    init_h/init_c [L, B, P] (broadcast to lanes internally),
    bias [V] f32 additive log-space vocabulary bias.
    graph: optional ops.beam.TokenTrie — compiles the decoding-graph-
    constrained variant: two VMEM-resident [Np, VP] tables and a
    per-hypothesis graph state; expansions are masked to trie-legal
    continuations with arc weights added (k2 parity; finality and final
    weights are applied by the caller from the returned g_f).
    Returns the BeamTrace fields: (pool_scores [B,K], pool_lens [B,K],
    exp_parent [T,S,B,K], exp_token, pool_ps [T,B,K], pool_pk [T,B,K])
    plus g_f [B,K] when graph is given.
    """
    b, t_max, d_joint = enc_pre.shape
    k = beam_width
    s_max = max_expansions
    bk = b * k
    vocab = joint_params["out"]["w"].shape[1]
    dt = enc_pre.dtype
    # the kernel hardcodes the 2-layer prediction LSTM of the reference
    # contract (states [2, B, 640]); other depths must use the XLA beam
    assert len(pred_params["lstm"]) == 2, (
        "beam_loop_pallas supports pred_layers == 2 only; "
        "route other models to ops.beam.beam_decode")

    wo_pad, bo_pad = pad_joint_params(joint_params, vocab)
    embed_pad = jnp.pad(pred_params["embed"],
                        ((0, VOCAB_PAD - vocab), (0, 0)))
    bias_pad = jnp.pad(bias.astype(jnp.float32), (0, VOCAB_PAD - vocab))

    # broadcast init state to B*K lanes (lane r = b*K + k)
    h_bk = jnp.repeat(init_h, k, axis=1).astype(dt)       # [L, BK, P]
    c_bk = jnp.repeat(init_c, k, axis=1).astype(dt)

    graph_in = []
    n_states = 0
    if graph is not None:
        n_raw = graph.next_state.shape[0]
        n_states = -(-n_raw // 8) * 8   # sublane-aligned state count
        # V axis -> VOCAB_PAD with -1 (illegal); extra state rows illegal
        nxt = jnp.full((n_states, VOCAB_PAD), -1.0, jnp.float32)
        nxt = nxt.at[:n_raw, :vocab].set(
            graph.next_state.astype(jnp.float32))
        aw = jnp.zeros((n_states, VOCAB_PAD), jnp.float32)
        aw = aw.at[:n_raw, :vocab].set(
            graph.arc_weight.astype(jnp.float32))
        graph_in = [nxt, aw]

    quant = pred_quant is not None
    kernel = _make_kernel(b, k, t_max, s_max, VOCAB_PAD, blank_id,
                          n_states=n_states, quant=quant)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((b, k), jnp.float32),         # pool scores
        jax.ShapeDtypeStruct((b, k), jnp.int32),           # pool lens
        jax.ShapeDtypeStruct((s_max, t_max, bk), jnp.int32),  # exp parent
        jax.ShapeDtypeStruct((s_max, t_max, bk), jnp.int32),  # exp token
        jax.ShapeDtypeStruct((t_max, bk), jnp.int32),      # pool ps
        jax.ShapeDtypeStruct((t_max, bk), jnp.int32),      # pool pk
    )
    if n_states:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((b, k), jnp.int32),)      # g_f
    if quant:
        pq = pred_quant
        lstm_args = (
            pq["wx0_q"], pq["sx0"][None, :], pq["wh0_q"], pq["sh0"][None, :],
            pred_params["lstm"][0]["b"].astype(jnp.float32)[None, :],
            pq["wx1_q"], pq["sx1"][None, :], pq["wh1_q"], pq["sh1"][None, :],
            pred_params["lstm"][1]["b"].astype(jnp.float32)[None, :])
    else:
        lstm_args = (
            pred_params["lstm"][0]["w"].astype(dt),
            pred_params["lstm"][0]["b"].astype(jnp.float32)[None, :],
            pred_params["lstm"][1]["w"].astype(dt),
            pred_params["lstm"][1]["b"].astype(jnp.float32)[None, :])
    outs = pl.pallas_call(
        kernel,
        in_specs=[whole] * (10 + len(lstm_args) + len(graph_in)),
        out_specs=tuple([whole] * len(out_shape)),
        out_shape=out_shape,
        # the unrolled micro-steps keep several [BK, Vp] temporaries live;
        # the default 16 MB scoped-vmem stack is too small at flagship
        # shapes (measured 43 MB at B=16, K=10)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(enc_pre.reshape(b * t_max, d_joint),
      enc_lens.astype(jnp.int32)[:, None], h_bk, c_bk,
      bias_pad[None, :], embed_pad.astype(dt),
      *lstm_args,
      joint_params["pred_proj"]["w"].astype(dt),
      joint_params["pred_proj"]["b"].astype(jnp.float32)[None, :],
      wo_pad.astype(dt), bo_pad[None, :], *graph_in)
    scores, lens, expp, expt, pps, ppk = outs[:6]
    # [S, T, BK] -> [T, S, B, K]; [T, BK] -> [T, B, K]
    exp_parent = jnp.transpose(expp, (1, 0, 2)).reshape(
        t_max, s_max, b, k)
    exp_token = jnp.transpose(expt, (1, 0, 2)).reshape(t_max, s_max, b, k)
    pool_ps = pps.reshape(t_max, b, k)
    pool_pk = ppk.reshape(t_max, b, k)
    base = (scores, lens, exp_parent, exp_token, pool_ps, pool_pk)
    return base + (outs[6],) if n_states else base
