"""Model family tests: shapes per the reference tensor contract, masking
invariances, prediction-net step/scan consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer, get_preset


@pytest.fixture(scope="module")
def tiny():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_encoder_contract_shapes(tiny):
    model, params = tiny
    cfg = model.config
    b, t = 2, 64
    feats = jnp.zeros((b, cfg.n_mels, t))
    lens = jnp.array([64, 40])
    enc, enc_lens = model.encode(params, feats, lens)
    assert enc.shape == (b, t // cfg.subsampling_factor, cfg.d_enc)
    np.testing.assert_array_equal(np.asarray(enc_lens), [16, 10])


def test_encoder_padding_invariance(tiny):
    """A sequence's encoding must not depend on batch padding length."""
    model, params = tiny
    cfg = model.config
    rng = np.random.default_rng(1)
    t1, t2 = 32, 64
    f1 = rng.standard_normal((cfg.n_mels, t1)).astype(np.float32)

    solo, solo_lens = model.encode(
        params, f1[None], jnp.array([t1]))
    padded = np.zeros((1, cfg.n_mels, t2), np.float32)
    padded[0, :, :t1] = f1
    batch, batch_lens = model.encode(params, jnp.asarray(padded),
                                     jnp.array([t1]))
    n_valid = int(solo_lens[0])
    assert int(batch_lens[0]) == n_valid
    np.testing.assert_allclose(
        np.asarray(batch)[0, :n_valid], np.asarray(solo)[0, :n_valid],
        atol=1e-5, rtol=1e-4)
    # padded output frames are zeroed
    assert np.abs(np.asarray(batch)[0, n_valid:]).max() == 0.0


def test_pred_step_and_scan_consistency(tiny):
    """pred_forward (lax.scan) must equal repeated pred_step."""
    model, params = tiny
    cfg = model.config
    b, u = 3, 5
    targets = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.blank_id, (b, u)),
        jnp.int32)
    state0 = model.init_state(b)

    scan_out, scan_state = model.predict_forward(params, targets, state0)
    assert scan_out.shape == (b, u + 1, cfg.d_pred)

    state = state0
    outs = []
    tokens = jnp.full((b,), cfg.blank_id, jnp.int32)
    for i in range(u + 1):
        out, state = model.predict_step(params, tokens, state)
        outs.append(out)
        if i < u:
            tokens = targets[:, i]
    manual = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(scan_out), np.asarray(manual),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(scan_state[0]),
                               np.asarray(state[0]), atol=1e-6)


def test_blank_embeds_to_zero_state_noop(tiny):
    """Feeding blank (SOS) twice from zero state gives the same output:
    blank embeds to the zero vector so it's a pure state transition."""
    model, params = tiny
    cfg = model.config
    state = model.init_state(1)
    blank = jnp.full((1,), cfg.blank_id, jnp.int32)
    out1, st1 = model.predict_step(params, blank, state)
    tok = jnp.zeros((1,), jnp.int32)
    out_tok, _ = model.predict_step(params, tok, state)
    # blank and a real token from the same state give different outputs
    assert np.abs(np.asarray(out1) - np.asarray(out_tok)).max() > 0


def test_joint_contract_shapes(tiny):
    model, params = tiny
    cfg = model.config
    b, t, u = 2, 7, 4
    enc = jnp.ones((b, t, cfg.d_enc))
    pred = jnp.ones((b, u, cfg.d_pred))
    lattice = model.joint_full(params, enc, pred)
    assert lattice.shape == (b, t, u, cfg.vocab_size)

    logits = model.joint_step(params, enc[:, 0], pred[:, 0])
    assert logits.shape == (b, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(lattice[:, 0, 0]), atol=1e-5)


def test_large_preset_contract_dims():
    cfg = get_preset("large")
    assert cfg.n_mels == 128
    assert cfg.d_enc == 1024
    assert cfg.d_pred == 640
    assert cfg.pred_layers == 2
    assert cfg.vocab_size == 1030
    assert cfg.blank_id == 1024


def test_param_count_reasonable(tiny):
    model, params = tiny
    n = model.param_count(params)
    assert 10_000 < n < 2_000_000
