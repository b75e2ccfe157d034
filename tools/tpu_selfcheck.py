"""Hardware acceptance test: runs the numerical invariants that interpret
mode and the CPU mesh cannot prove, ON the real chip.

    python tools/tpu_selfcheck.py [--preset tiny]

Checks:
  1. Pallas fused log-mel == XLA mel path (compiled, not interpreted)
  2. greedy lookahead=8 == lookahead=1 on-device
  3. streaming chunked encoder == batch causal forward on-device
  4. pipeline smoke: bytes -> text, deterministic across calls

Exits nonzero on any failure — wire into deploy pipelines before serving.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import dataclasses
import sys
import time


def check(name: str, fn) -> bool:
    t0 = time.time()
    try:
        fn()
        print(f"  PASS {name} ({time.time()-t0:.1f}s)")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  FAIL {name}: {e}")
        return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this validates semantics only")

    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer, get_preset
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
    from amira_rust_asr_server_tpu.ops.pallas.mel_kernel import (
        log_mel_features_pallas)
    from amira_rust_asr_server_tpu.ops.streaming import (encode_chunk,
                                                         init_encoder_cache)
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    rng = np.random.default_rng(0)
    ok = True

    # 1. pallas mel vs xla mel -------------------------------------------
    def mel_check():
        n = 48000
        w = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
        lens = np.array([n, n - 8000])
        interp = dev.platform == "cpu"
        got, gl = log_mel_features_pallas(w, lens, interpret=interp)
        ref, rl = log_mel_features(w, lens)
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(rl))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=1e-3)

    ok &= check("pallas mel == xla mel", mel_check)

    # 2. lookahead equivalence -------------------------------------------
    model = Transducer.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    def lookahead_check():
        enc = jnp.asarray(rng.standard_normal((2, 24, model.config.d_enc)),
                          jnp.float32)
        lens = jnp.array([24, 17])
        r1 = greedy_decode_transducer(model, params, enc, lens, lookahead=1)
        r8 = greedy_decode_transducer(model, params, enc, lens, lookahead=8)
        np.testing.assert_array_equal(np.asarray(r1.tokens),
                                      np.asarray(r8.tokens))
        np.testing.assert_array_equal(np.asarray(r1.counts),
                                      np.asarray(r8.counts))

    ok &= check("greedy lookahead equivalence", lookahead_check)

    # 3. streaming == batch (causal variant of the preset) ----------------
    def streaming_check():
        cfg = dataclasses.replace(get_preset(args.preset), causal=True,
                                  att_context=(8, 0))
        smodel = Transducer(cfg)
        sparams = jax.jit(smodel.init)(jax.random.PRNGKey(1))
        t = 8 * cfg.subsampling_factor
        feats = jnp.asarray(rng.standard_normal((1, cfg.n_mels, t)),
                            jnp.float32)
        full, _ = smodel.encode(sparams, feats, jnp.array([t]))
        cache = init_encoder_cache(cfg, 1)
        step = 2 * cfg.subsampling_factor
        outs = []
        for i in range(0, t, step):
            e, cache = encode_chunk(sparams["encoder"], cfg,
                                    feats[:, :, i:i + step], cache)
            outs.append(np.asarray(e))
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(full), atol=3e-4, rtol=1e-2)

    ok &= check("streaming chunked == batch forward", streaming_check)

    # 3b. fused Pallas decode step == XLA logits path ----------------------
    def fused_decode_check():
        from functools import partial as _partial
        from amira_rust_asr_server_tpu.ops.greedy import greedy_decode
        from amira_rust_asr_server_tpu.ops.pallas.decode_step import (
            make_fused_step_fn)
        cfg = model.config
        enc = jnp.asarray(rng.standard_normal((2, 16, cfg.d_enc)),
                          jnp.float32)
        enc_pre = model.joint_precompute_enc(params, enc)
        lens = jnp.array([16, 11])
        pf = _partial(model.predict_step, params)
        jf = _partial(model.joint_step_pre, params)
        interp = dev.platform == "cpu"
        base = greedy_decode(pf, jf, enc_pre, lens,
                             model.init_state(2), cfg.blank_id)
        fused = greedy_decode(
            pf, jf, enc_pre, lens, model.init_state(2), cfg.blank_id,
            fused_step_fn=make_fused_step_fn(model, params,
                                             interpret=interp))
        np.testing.assert_array_equal(np.asarray(base.tokens),
                                      np.asarray(fused.tokens))

    ok &= check("fused pallas decode step == xla", fused_decode_check)

    # 3c. whole-decode-loop Pallas kernel == XLA loop ----------------------
    # Uses the committed digits checkpoint: a trained model's decisive
    # logit margins make token-level equality robust to the (documented)
    # MXU-precision differences between the HIGHEST-precision kernel and
    # the default-precision XLA reference; random near-tie logits are not.
    def decode_loop_check(quant=False):
        from amira_rust_asr_server_tpu.ops import log_mel_features
        from amira_rust_asr_server_tpu.ops.pallas.decode_loop import (
            greedy_loop_pallas, quantize_pred_lstm)
        from amira_rust_asr_server_tpu.testing import synth_digits
        repo = pathlib.Path(__file__).resolve().parents[1]
        ckpt = repo / "model-repo" / "tiny-digits"
        assert ckpt.exists(), "tiny-digits checkpoint missing"
        dmodel = Transducer.from_preset("tiny")
        dparams = dmodel.load_checkpoint(
            str(ckpt), like=jax.jit(dmodel.init)(jax.random.PRNGKey(0)))
        cfg = dmodel.config
        drng = np.random.default_rng(7)
        waves = [synth_digits(["two", "five", "nine"], noise=0.004,
                              rng=drng),
                 synth_digits(["one", "six"], noise=0.004, rng=drng)]
        b, n = 2, 32000
        audio = np.zeros((b, n), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, w in enumerate(waves):
            audio[i, :len(w)] = w
            lens[i] = len(w)
        feats, fl = log_mel_features(jnp.asarray(audio), jnp.asarray(lens),
                                     n_mels=cfg.n_mels)
        enc, el = dmodel.encode(dparams, feats, fl)
        enc_pre = dmodel.joint_precompute_enc(dparams, enc)
        ref = greedy_decode_transducer(dmodel, dparams, enc, el)
        h0, c0 = dmodel.init_state(b)
        pred0, (h0, c0) = dmodel.predict_step(
            dparams, jnp.full((b,), cfg.blank_id, jnp.int32), (h0, c0))
        pq = quantize_pred_lstm(dparams["predictor"]) if quant else None
        tokens, counts, frames, _, _, _, _ = greedy_loop_pallas(
            enc_pre, el, h0, c0, pred0,
            jnp.full((b,), cfg.blank_id, jnp.int32),
            jnp.zeros((b,), jnp.int32), dparams["predictor"],
            dparams["joint"], pq, blank_id=cfg.blank_id, max_symbols=30,
            max_total=200, interpret=dev.platform == "cpu")
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(ref.counts))
        assert int(np.asarray(counts)[0]) == 3  # really decoded speech
        for i in range(b):
            n_tok = int(np.asarray(counts)[i])
            np.testing.assert_array_equal(
                np.asarray(tokens)[i, :n_tok],
                np.asarray(ref.tokens)[i, :n_tok])
            np.testing.assert_array_equal(
                np.asarray(frames)[i, :n_tok],
                np.asarray(ref.frame_idx)[i, :n_tok])

    ok &= check("pallas decode loop == xla loop", decode_loop_check)
    # int8-resident LSTM weights (config.int8_decode_weights): token
    # equality on the trained checkpoint is the quality contract
    ok &= check("int8-resident decode loop == xla loop",
                lambda: decode_loop_check(quant=True))

    def beam_loop_check():
        from functools import partial

        from amira_rust_asr_server_tpu.ops.beam import (BeamTrace, backtrace,
                                                        beam_decode)
        from amira_rust_asr_server_tpu.ops.pallas.beam_loop import (
            beam_loop_pallas)
        cfg = model.config
        brng = np.random.default_rng(11)
        b, t, beam, s_max = 2, 12, 4, 3
        enc = jnp.asarray(
            brng.standard_normal((b, t, cfg.d_enc)).astype(np.float32))
        enc_lens = jnp.asarray([t, t - 4], jnp.int32)
        enc_pre = model.joint_precompute_enc(params, enc)
        bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
        want = beam_decode(
            partial(model.predict_step, params),
            partial(model.joint_step_pre, params),
            enc_pre, enc_lens, model.init_state(b), cfg.blank_id,
            beam_width=beam, max_expansions=s_max,
            vocab_size=cfg.vocab_size)
        outs = beam_loop_pallas(
            enc_pre, enc_lens, *model.init_state(b), bias,
            params["predictor"], params["joint"], beam_width=beam,
            max_expansions=s_max, blank_id=cfg.blank_id,
            interpret=dev.platform == "cpu")
        scores, lens_, expp, expt, pps, ppk = [np.asarray(o) for o in outs]
        got = BeamTrace(pool_scores=scores, pool_lens=lens_,
                        exp_parent=expp, exp_token=expt,
                        pool_parent_s=pps, pool_parent_k=ppk,
                        pool_final=np.ones_like(scores, bool))
        np.testing.assert_allclose(scores, np.asarray(want.pool_scores),
                                   rtol=2e-2, atol=2e-2)
        w = backtrace(want, np.asarray(enc_lens), n_best=2)
        g = backtrace(got, np.asarray(enc_lens), n_best=2)
        np.testing.assert_array_equal(g.tokens, w.tokens)
        np.testing.assert_array_equal(g.counts, w.counts)

    ok &= check("pallas beam loop == xla beam", beam_loop_check)

    def beam_graph_check():
        from functools import partial

        from amira_rust_asr_server_tpu.ops.beam import (backtrace,
                                                        beam_decode,
                                                        TokenTrie)
        cfg = model.config
        brng = np.random.default_rng(13)
        b, t, beam, s_max = 2, 10, 3, 2
        enc = jnp.asarray(
            brng.standard_normal((b, t, cfg.d_enc)).astype(np.float32))
        enc_lens = jnp.asarray([t, t - 3], jnp.int32)
        enc_pre = model.joint_precompute_enc(params, enc)
        graph = TokenTrie.from_token_seqs(
            [[0, 1], [2], [3, 4, 5], [1, 2]], vocab_size=cfg.vocab_size,
            loop=True, weights=list(brng.standard_normal(4)),
            final_weights=list(brng.standard_normal(4)))
        want = beam_decode(
            partial(model.predict_step, params),
            partial(model.joint_step_pre, params),
            enc_pre, enc_lens, model.init_state(b), cfg.blank_id,
            beam_width=beam, max_expansions=s_max,
            vocab_size=cfg.vocab_size, graph=graph)
        vocab = Vocabulary.from_map(
            {i: f"w{i}" for i in range(model.config.blank_id)})
        pipe = AsrPipeline(model, params, vocab,
                           Config(audio_sec_buckets=[1.0],
                                  batch_buckets=[b], decoding_mode="beam",
                                  beam_width=beam,
                                  compute_dtype="float32",
                                  warmup_on_start=False))
        got = pipe._beam_trace_via_kernel(
            pipe.params, enc_pre, enc_lens, None, graph=graph,
            beam_width=beam, max_expansions=s_max,
            interpret=dev.platform == "cpu")
        np.testing.assert_allclose(np.asarray(got.pool_scores),
                                   np.asarray(want.pool_scores),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(got.pool_final),
                                      np.asarray(want.pool_final))
        w = backtrace(want, np.asarray(enc_lens), n_best=2)
        g = backtrace(got, np.asarray(enc_lens), n_best=2)
        np.testing.assert_array_equal(g.tokens, w.tokens)
        np.testing.assert_array_equal(g.counts, w.counts)

    ok &= check("pallas beam graph == xla graph beam", beam_graph_check)

    # 4. pipeline smoke + determinism -------------------------------------
    def pipeline_check():
        vocab = Vocabulary.from_map(
            {i: f"w{i}" for i in range(model.config.blank_id)})
        cfg = Config(audio_sec_buckets=[1.0], batch_buckets=[1],
                     warmup_on_start=False)
        pipe = AsrPipeline(model, params, vocab, cfg)
        pcm = rng.integers(-3000, 3000, 8000, dtype=np.int16).tobytes()
        t1 = pipe.process_batch(pcm)
        t2 = pipe.process_batch(pcm)
        assert t1.tokens == t2.tokens, "nondeterministic decode"
        assert t1.features_length == 1 + 8000 // 160

    ok &= check("pipeline smoke + determinism", pipeline_check)

    print("selfcheck:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
