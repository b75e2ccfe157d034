"""int8 (W8A8 dynamic) quantized serving path.

Locks three properties:
- ops/quant.quant_dense approximates the f32 dense to ~1% relative error;
- the quantized encoder is numerically close to the f32 encoder and the
  param pytree is IDENTICAL between quant/non-quant (checkpoint compat);
- a pipeline built with quantization="int8" still produces the exact
  golden transcripts on the trained digits checkpoint (argmax decode is
  quant-robust end to end).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.ops.quant import (quant_dense,
                                                 quantize_act_int8,
                                                 quantize_weight_int8)


def test_quant_dense_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((48, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 160)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(160) * 0.1, jnp.float32)
    ref = x @ w + b
    got = quant_dense(x, w, b)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_quant_dense_3d_and_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 17, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.bfloat16)
    got = quant_dense(x, w)
    assert got.shape == (2, 17, 32)
    assert got.dtype == jnp.bfloat16
    ref = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_weight_quant_per_channel_scales():
    w = jnp.asarray([[1.0, -0.5], [-2.0, 0.25]], jnp.float32)
    wq, s = quantize_weight_int8(w)
    assert wq.dtype == jnp.int8
    # column amax / 127
    np.testing.assert_allclose(np.asarray(s), [2.0 / 127, 0.5 / 127],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(wq.astype(jnp.float32) * s[None]),
                               np.asarray(w), atol=0.02)


def test_act_quant_per_row():
    x = jnp.asarray([[1.0, -4.0, 2.0], [0.1, 0.2, -0.05]], jnp.float32)
    xq, s = quantize_act_int8(x)
    assert xq.shape == x.shape and s.shape == (2, 1)
    np.testing.assert_allclose(
        np.asarray(xq.astype(jnp.float32) * s), np.asarray(x), atol=0.05)
    # rows scale independently: both rows use the full int8 range
    assert int(jnp.max(jnp.abs(xq[0]))) == 127
    assert int(jnp.max(jnp.abs(xq[1]))) == 127


@pytest.mark.slow
def test_encoder_quant_close_and_pytree_identical():
    cfg_q = dataclasses.replace(TINY, quant_int8=True)
    model = Transducer(TINY)
    model_q = Transducer(cfg_q)
    params = model.init(jax.random.PRNGKey(0))
    # identical param structure: quant is a pure apply-time reroute
    sq = jax.tree_util.tree_structure(model_q.init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == sq

    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((2, TINY.n_mels, 64)) * 0.5,
                        jnp.float32)
    lens = jnp.asarray([64, 40], jnp.int32)
    enc, el = model.encode(params, feats, lens)
    enc_q, el_q = model_q.encode(params, feats, lens)
    np.testing.assert_array_equal(np.asarray(el), np.asarray(el_q))
    # layered quant error compounds; demand strong agreement, not equality
    denom = float(jnp.sqrt(jnp.mean(enc * enc))) + 1e-9
    rmse = float(jnp.sqrt(jnp.mean((enc - enc_q) ** 2)))
    assert rmse / denom < 0.15, rmse / denom


def test_pallas_quant_matmul_interpret_matches_xla():
    """The fused Pallas W8A8 kernel (interpret mode) must agree with the
    XLA composite to float tolerance — same quant scheme, same scales."""
    from amira_rust_asr_server_tpu.ops.pallas.quant_matmul import \
        quant_matmul_pallas

    rng = np.random.default_rng(3)
    m, k, n = 288, 128, 256  # ragged M tile (288 = 256 + 32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    wq, ws = quantize_weight_int8(w)
    got = quant_matmul_pallas(x, wq, ws, b, interpret=True)
    # same scheme by hand
    xq, a_s = quantize_act_int8(x)
    ref = (xq.astype(jnp.float32) @ wq.astype(jnp.float32)) * a_s * ws + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(os.path.dirname(__file__), "..",
                                   "model-repo", "tiny-digits")),
    reason="digits checkpoint asset missing")
@pytest.mark.slow
def test_int8_pipeline_keeps_golden_transcripts():
    """The served text must survive quantization exactly (argmax decode on
    the trained digits model has decisive margins)."""
    from tests.test_golden_e2e import digits_state, pcm16

    state = digits_state(quantization="int8")
    assert state.pipeline.model.config.quant_int8
    tr = state.pipeline.process_batch(pcm16(["two", "five", "nine"]))
    assert tr.text == "two five nine"
    tr2 = state.pipeline.process_batch(
        pcm16(["seven", "one", "zero", "four"]))
    assert tr2.text == "seven one zero four"
