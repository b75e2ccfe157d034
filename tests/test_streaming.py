"""Native streaming encoder: chunked-with-cache == full batch forward
(the property the reference's re-decode+weave approach can't have)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
from amira_rust_asr_server_tpu.ops.streaming import (encode_chunk,
                                                     init_encoder_cache)


@pytest.fixture(scope="module")
def causal_tiny():
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _feats(rng, t, n_mels):
    return jnp.asarray(rng.standard_normal((1, n_mels, t)), jnp.float32)


@pytest.mark.slow
def test_chunked_equals_full(causal_tiny):
    model, params = causal_tiny
    cfg = model.config
    rng = np.random.default_rng(0)
    t = 64
    feats = _feats(rng, t, cfg.n_mels)

    full, full_lens = model.encode(params, feats, jnp.array([t]))

    cache = init_encoder_cache(cfg, batch=1)
    chunks = []
    step = 16  # mel frames per chunk (multiple of subsampling 4)
    for i in range(0, t, step):
        enc, cache = encode_chunk(params["encoder"], cfg,
                                  feats[:, :, i:i + step], cache)
        chunks.append(np.asarray(enc))
    streamed = np.concatenate(chunks, axis=1)

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, np.asarray(full),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_chunk_size_invariance(causal_tiny):
    """Different chunkings must produce identical encodings."""
    model, params = causal_tiny
    cfg = model.config
    rng = np.random.default_rng(1)
    t = 48
    feats = _feats(rng, t, cfg.n_mels)

    outs = []
    for step in (8, 16, 24):
        cache = init_encoder_cache(cfg, batch=1)
        chunks = []
        for i in range(0, t, step):
            enc, cache = encode_chunk(params["encoder"], cfg,
                                      feats[:, :, i:i + step], cache)
            chunks.append(np.asarray(enc))
        outs.append(np.concatenate(chunks, axis=1))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(outs[0], outs[2], atol=2e-4, rtol=1e-3)


def test_cache_pos_advances(causal_tiny):
    model, params = causal_tiny
    cfg = model.config
    rng = np.random.default_rng(2)
    cache = init_encoder_cache(cfg, batch=1)
    assert int(cache.pos[0]) == 0
    _, cache = encode_chunk(params["encoder"], cfg,
                            _feats(rng, 16, cfg.n_mels), cache)
    assert int(cache.pos[0]) == 4  # 16 mel frames / subsampling 4


@pytest.mark.slow
def test_streaming_end_to_end_greedy(causal_tiny):
    """Chunked encode + carried greedy state == one-shot decode."""
    model, params = causal_tiny
    cfg = model.config
    rng = np.random.default_rng(3)
    t = 64
    feats = _feats(rng, t, cfg.n_mels)

    # make emissions sparse so max_total never binds
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(2.0))

    full_enc, full_lens = model.encode(params, feats, jnp.array([t]))
    full = greedy_decode_transducer(model, params, full_enc, full_lens)
    c_full = int(full.counts[0])

    cache = init_encoder_cache(cfg, batch=1)
    carry = None
    tokens = []
    for i in range(0, t, 16):
        enc, cache = encode_chunk(params["encoder"], cfg,
                                  feats[:, :, i:i + 16], cache)
        res = greedy_decode_transducer(
            model, params, enc, jnp.array([enc.shape[1]]), carry=carry)
        carry = res
        n = int(res.counts[0])
        tokens.extend(int(x) for x in np.asarray(res.tokens)[0, :n])

    assert tokens == [int(x) for x in np.asarray(full.tokens)[0, :c_full]]


def test_jit_compatible(causal_tiny):
    model, params = causal_tiny
    cfg = model.config
    rng = np.random.default_rng(4)
    step_fn = jax.jit(lambda p, f, c: encode_chunk(p, cfg, f, c))
    cache = init_encoder_cache(cfg, batch=1)
    enc, cache2 = step_fn(params["encoder"], _feats(rng, 16, cfg.n_mels),
                          cache)
    assert enc.shape == (1, 4, cfg.d_enc)
    # second call hits the same compiled program
    enc2, _ = step_fn(params["encoder"], _feats(rng, 16, cfg.n_mels),
                      cache2)
    assert enc2.shape == (1, 4, cfg.d_enc)


@pytest.mark.slow
def test_layerscale_chunked_equals_full():
    """LayerScale gains (deep-stack trainability, presets.ModelConfig.
    layerscale) must stream exactly like they batch; ls=0 keeps the
    parameter tree unchanged (checkpoint compatibility)."""
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0),
                              layerscale=0.1)
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(1))
    assert "ls_ff1" in params["encoder"]["block0"]

    rng = np.random.default_rng(3)
    t = 48
    feats = _feats(rng, t, cfg.n_mels)
    full, _ = model.encode(params, feats, jnp.array([t]))

    cache = init_encoder_cache(cfg, batch=1)
    chunks = []
    for i in range(0, t, 16):
        enc, cache = encode_chunk(params["encoder"], cfg,
                                  feats[:, :, i:i + 16], cache)
        chunks.append(np.asarray(enc))
    np.testing.assert_allclose(np.concatenate(chunks, axis=1),
                               np.asarray(full), atol=2e-4, rtol=1e-3)

    cfg0 = dataclasses.replace(cfg, layerscale=0.0)
    p0 = Transducer(cfg0).init(jax.random.PRNGKey(1))
    assert "ls_ff1" not in p0["encoder"]["block0"]
