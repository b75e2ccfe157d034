"""Mixture-of-experts feed-forward: gating math, expert-parallel
sharding equality, streaming equality, and trainability.

The MoE ff2 (encoder.MoEFeedForward) is additive beyond the reference —
it exists to make expert parallelism real (the expert dim shards over
the `model` mesh axis, parallel/mesh.py), so the sharding tests here are
the point, not a nicety.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY

MOE_CFG = dataclasses.replace(TINY, moe_experts=4, moe_top_k=2)


@pytest.fixture(scope="module")
def model():
    return Transducer(MOE_CFG)


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def _feats(rng, b=2, t=64, n_mels=32):
    feats = jnp.asarray(rng.standard_normal((b, n_mels, t)) * 0.3,
                        jnp.float32)
    lens = jnp.asarray([t, t - 16][:b], jnp.int32)
    return feats, lens


def test_moe_params_exist_and_forward_finite(model, params, rng):
    ff2 = params["encoder"]["block0"]["ff2"]
    assert ff2["w1"].shape == (4, 64, 128)  # [E, d, ff*d]
    assert ff2["w2"].shape == (4, 128, 64)
    assert ff2["gate"].shape == (64, 4)
    feats, lens = _feats(rng)
    enc, enc_lens = jax.jit(model.encode)(params, feats, lens)
    assert np.isfinite(np.asarray(enc)).all()
    assert enc.shape[-1] == MOE_CFG.d_enc


def test_topk_equals_full_softmax_when_k_is_e(rng):
    """k=E degenerates to a softmax-weighted dense mixture."""
    from amira_rust_asr_server_tpu.models.encoder import MoEFeedForward
    cfg_full = dataclasses.replace(TINY, moe_experts=3, moe_top_k=3)
    mod = MoEFeedForward(cfg_full)
    x = jnp.asarray(rng.standard_normal((1, 5, 64)) * 0.5, jnp.float32)
    p = mod.init(jax.random.PRNGKey(1), x)["params"]
    out = mod.apply({"params": p}, x)

    # manual dense mixture in numpy
    xn = np.asarray(x)
    gate = np.asarray(p["gate"])
    logits = xn @ gate
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    y = np.zeros_like(xn)
    for e in range(3):
        h = xn @ np.asarray(p["w1"])[e] + np.asarray(p["b1"])[e]
        h = h * (1 / (1 + np.exp(-h)))  # silu
        y += w[..., e:e + 1] * (h @ np.asarray(p["w2"])[e]
                                + np.asarray(p["b2"])[e])
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-5)


def test_top1_selects_argmax_expert(rng):
    """k=1: output is exactly the argmax expert's FF (combine weight 1)."""
    from amira_rust_asr_server_tpu.models.encoder import MoEFeedForward
    cfg1 = dataclasses.replace(TINY, moe_experts=4, moe_top_k=1)
    mod = MoEFeedForward(cfg1)
    x = jnp.asarray(rng.standard_normal((1, 3, 64)) * 0.5, jnp.float32)
    p = mod.init(jax.random.PRNGKey(2), x)["params"]
    out = np.asarray(mod.apply({"params": p}, x))

    xn = np.asarray(x)
    sel = (xn @ np.asarray(p["gate"])).argmax(-1)  # [1, 3]
    for t in range(3):
        e = int(sel[0, t])
        h = xn[0, t] @ np.asarray(p["w1"])[e] + np.asarray(p["b1"])[e]
        h = h * (1 / (1 + np.exp(-h)))
        y = h @ np.asarray(p["w2"])[e] + np.asarray(p["b2"])[e]
        np.testing.assert_allclose(out[0, t], y, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_expert_parallel_sharding_and_equality(model, params, rng):
    """EP: expert dims shard over `model`; sharded forward == unsharded."""
    from amira_rust_asr_server_tpu.parallel import (make_mesh,
                                                    make_param_shardings,
                                                    shard_params)
    mesh = make_mesh({"data": 2, "model": 4})
    sh = make_param_shardings(mesh, params)
    spec = sh["encoder"]["block0"]["ff2"]["w1"].spec
    assert spec[0] == "model", spec  # expert dim is the sharded one
    assert sh["encoder"]["block0"]["ff2"]["b1"].spec[0] == "model"

    feats, lens = _feats(rng)
    ref, _ = jax.jit(model.encode)(params, feats, lens)
    sharded = shard_params(mesh, params)
    out, _ = jax.jit(model.encode)(sharded, feats, lens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_moe_streaming_chunked_equals_batch(rng):
    """Causal MoE model: chunked cache encoder == full batch forward."""
    from amira_rust_asr_server_tpu.ops.streaming import (encode_chunk,
                                                         init_encoder_cache)
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0),
                              moe_experts=4, moe_top_k=2)
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    t = 64
    feats = jnp.asarray(rng.standard_normal((1, cfg.n_mels, t)) * 0.3,
                        jnp.float32)
    lens = jnp.asarray([t], jnp.int32)
    full, _ = jax.jit(model.encode)(params, feats, lens)

    cache = init_encoder_cache(cfg, batch=1)
    chunk = 16
    outs = []
    for i in range(0, t, chunk):
        enc, cache = encode_chunk(params["encoder"], cfg,
                                  feats[:, :, i:i + chunk], cache)
        outs.append(enc)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_moe_train_step_sharded_matches_unsharded(model):
    from amira_rust_asr_server_tpu.parallel import (TrainBatch,
                                                    init_training,
                                                    make_mesh,
                                                    make_optimizer,
                                                    make_train_step)
    optimizer = make_optimizer(lr=1e-3)
    rng = np.random.default_rng(5)
    n, u = 3200, 4
    batch = TrainBatch(
        audio=jnp.asarray(rng.standard_normal((2, n)) * 0.1, jnp.float32),
        audio_lens=jnp.asarray([n, n - 800], jnp.int32),
        labels=jnp.asarray(rng.integers(0, 15, (2, u)), jnp.int32),
        label_lens=jnp.asarray([u, 2], jnp.int32))

    p0, o0 = init_training(model, jax.random.PRNGKey(0), optimizer)
    _, _, loss_ref = make_train_step(model, optimizer)(p0, o0, batch)
    assert np.isfinite(float(loss_ref))

    mesh = make_mesh({"data": 2, "model": 4})
    p1, o1 = init_training(model, jax.random.PRNGKey(0), optimizer, mesh)
    step = make_train_step(model, optimizer, mesh)(p1, o1)
    _, _, loss_sh = step(p1, o1, batch)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-4)
