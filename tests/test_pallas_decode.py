"""Fused joint+argmax decode-step kernel vs the XLA logits path
(interpret mode on CPU; on-chip validation via tools/tpu_selfcheck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.greedy import greedy_decode
from amira_rust_asr_server_tpu.ops.pallas.decode_step import (
    joint_argmax_pallas, make_fused_step_fn, pad_joint_params)


@pytest.fixture(scope="module")
def tiny():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_kernel_matches_xla_joint(tiny):
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(0)
    b, f = 4, 8
    enc_pre = jnp.asarray(rng.standard_normal((b, f, cfg.d_joint)),
                          jnp.float32)
    pred = jnp.asarray(rng.standard_normal((b, cfg.d_pred)), jnp.float32)

    step = make_fused_step_fn(model, params, interpret=True)
    k, conf = step(enc_pre, pred)

    # XLA reference
    pred_rep = jnp.repeat(pred, f, axis=0)
    logits = model.joint_step_pre(params, enc_pre.reshape(b * f, -1),
                                  pred_rep).reshape(b, f, -1)
    k_ref = jnp.argmax(logits, axis=-1)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    conf_ref = jnp.exp(jnp.max(logits.astype(jnp.float32), axis=-1) - lse)

    np.testing.assert_array_equal(np.asarray(k), np.asarray(k_ref))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf_ref),
                               atol=1e-4)


def test_pad_never_wins(tiny):
    model, params = tiny
    cfg = model.config
    wo_pad, bo_pad = pad_joint_params(params["joint"], cfg.vocab_size)
    assert (np.asarray(bo_pad)[cfg.vocab_size:] < -1e20).all()
    assert (np.asarray(wo_pad)[:, cfg.vocab_size:] == 0).all()


def test_greedy_with_fused_step_matches_default(tiny):
    """Full greedy decode via the fused kernel == the logits path."""
    from functools import partial
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(1)
    b, t = 3, 12
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_enc)), jnp.float32)
    enc_pre = model.joint_precompute_enc(params, enc)
    lens = jnp.array([12, 9, 5])
    state = model.init_state(b)
    pred_fn = partial(model.predict_step, params)
    joint_fn = partial(model.joint_step_pre, params)

    base = greedy_decode(pred_fn, joint_fn, enc_pre, lens, state,
                         cfg.blank_id)
    fused = greedy_decode(
        pred_fn, joint_fn, enc_pre, lens, model.init_state(b), cfg.blank_id,
        fused_step_fn=make_fused_step_fn(model, params, interpret=True))

    np.testing.assert_array_equal(np.asarray(base.counts),
                                  np.asarray(fused.counts))
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(fused.tokens))
    np.testing.assert_allclose(np.asarray(base.confidence),
                               np.asarray(fused.confidence), atol=1e-4)
