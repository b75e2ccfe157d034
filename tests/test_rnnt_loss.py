"""RNN-T loss: scan+prefix formulation vs O(T*U) NumPy DP oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.ops.rnnt_loss import (rnnt_loss,
                                                     rnnt_loss_oracle,
                                                     transducer_loss)

BLANK = 5
VOCAB = 6


def _random_case(rng, t, u):
    """Random log-prob lattice [T, U+1, V] + labels."""
    logits = rng.standard_normal((t, u + 1, VOCAB)).astype(np.float32)
    log_probs = logits - np.log(
        np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(0, BLANK, u).astype(np.int32)
    return log_probs, labels


@pytest.mark.parametrize("t,u", [(1, 0), (3, 1), (5, 3), (8, 6), (12, 4)])
def test_matches_oracle(t, u):
    rng = np.random.default_rng(t * 100 + u)
    log_probs, labels = _random_case(rng, t, u)

    # feed through rnnt_loss with a log_probs_fn that looks up the lattice
    lattice = jnp.asarray(log_probs)[None]  # [1, T, U+1, V]
    enc = jnp.arange(t, dtype=jnp.float32)[None, :, None]  # frame index

    def log_probs_fn(enc_t):
        idx = enc_t[0, 0].astype(jnp.int32)
        return lattice[:, idx]

    got = rnnt_loss(log_probs_fn, enc, jnp.array([t]),
                    jnp.asarray(labels.reshape(1, u), jnp.int32),
                    jnp.array([u]), BLANK)
    want = rnnt_loss_oracle(log_probs, t, labels, BLANK)
    assert abs(float(got[0]) - want) < 1e-3


def test_batch_with_ragged_lens():
    rng = np.random.default_rng(7)
    t, u = 10, 5
    cases = [(6, 3), (10, 5), (4, 0)]
    lattice = np.stack([_random_case(rng, t, u)[0] for _ in cases])
    labels = np.stack([
        rng.integers(0, BLANK, u).astype(np.int32) for _ in cases])

    lat = jnp.asarray(lattice)
    enc = jnp.tile(jnp.arange(t, dtype=jnp.float32)[None, :, None],
                   (3, 1, 1))

    def log_probs_fn(enc_t):
        idx = enc_t[:, 0].astype(jnp.int32)
        return jnp.take_along_axis(
            lat, idx[:, None, None, None], axis=1)[:, 0]

    got = rnnt_loss(log_probs_fn, enc,
                    jnp.array([c[0] for c in cases]),
                    jnp.asarray(labels),
                    jnp.array([c[1] for c in cases]), BLANK)
    for i, (tl, ul) in enumerate(cases):
        want = rnnt_loss_oracle(lattice[i], tl, labels[i][:ul], BLANK)
        assert abs(float(got[i]) - want) < 1e-3, f"case {i}"


def test_transducer_loss_finite_and_differentiable():
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(0))
    cfg = model.config
    rng = np.random.default_rng(9)
    b, t, u = 2, 8, 4
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_enc)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.blank_id, (b, u)), jnp.int32)

    def scalar_loss(p):
        return transducer_loss(model, p, enc, jnp.array([8, 5]),
                               labels, jnp.array([4, 2])).sum()

    loss, grads = jax.value_and_grad(scalar_loss)(params)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the joint grads must be nonzero
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
