"""Orbax checkpoint roundtrip (SURVEY §5 checkpoint/resume: model weights
via orbax; stream state is reconstructible, never checkpointed)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from amira_rust_asr_server_tpu.models import Transducer


def test_checkpoint_roundtrip(tmp_path):
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(42))
    path = str(tmp_path / "ckpt")
    model.save_checkpoint(path, params)

    restored = model.load_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_drives_identical_decode(tmp_path):
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
    model = Transducer.from_preset("tiny")
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt2")
    model.save_checkpoint(path, params)
    restored = model.load_checkpoint(path)

    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((1, 8, model.config.d_enc)),
                      jnp.float32)
    r1 = greedy_decode_transducer(model, params, enc, jnp.array([8]))
    r2 = greedy_decode_transducer(model, restored, enc, jnp.array([8]))
    np.testing.assert_array_equal(np.asarray(r1.tokens),
                                  np.asarray(r2.tokens))
