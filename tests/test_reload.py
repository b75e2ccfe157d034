"""Live checkpoint reload (runtime/reload.py + /v2/repository/* routes).

The reference gets model management from Triton's repository API
(DEFAULT_MODEL_REPO, constants.rs:291-292); this framework serves the
equivalent in-process. These tests pin the contract: the index lists
pointer JSONs, a load swaps serving weights atomically (no restart, no
program rebuild), failures leave the old weights serving, and the
native-streaming engine only swaps with zero live lanes.
"""

import asyncio
import json
import os

import jax
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.runtime.reload import (
    ModelRepositoryError, ReloadConflictError, hot_swap, prepare_params,
    repository_index, resolve_checkpoint)
from amira_rust_asr_server_tpu.server import AppState, create_app
from amira_rust_asr_server_tpu.vocab import Vocabulary


def _vocab():
    return Vocabulary.from_map({i: f"w{i}" for i in range(15)})


def _make_repo(tmp_path, model, seeds=(0, 1)):
    """A repository with one pointer per seed: name ckpt<seed>."""
    repo = tmp_path / "repo"
    repo.mkdir()
    for s in seeds:
        params = model.init(jax.random.PRNGKey(s))
        tree = repo / f"tree{s}"
        model.save_checkpoint(str(tree), params)
        (repo / f"ckpt{s}.json").write_text(json.dumps({
            "preset": "tiny", "checkpoint": str(tree), "steps": 10 * s,
            "held_out_exact_match": 0.5 + s / 10}))
    # a non-model json must not show up in the index
    (repo / "eval_artifact.json").write_text(json.dumps({"wer": 0.1}))
    return str(repo)


def _state(tmp_path, **cfg_overrides):
    model = Transducer.from_preset("tiny")
    repo = _make_repo(tmp_path, model)
    params = model.init(jax.random.PRNGKey(0))
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1, 2],
                 max_symbols_per_step=5, max_total_tokens=50,
                 model_repo_path=repo, compute_dtype="float32",
                 **cfg_overrides)
    pipeline = AsrPipeline(model, params, _vocab(), cfg)
    return AppState(pipeline, _vocab(), cfg), model, repo



def _fingerprint(params):
    """Scalar digest over every leaf (first leaves can be zero-init)."""
    return float(sum(float(np.abs(np.asarray(x)).sum())
                     for x in jax.tree_util.tree_leaves(params)))

# ---------------------------------------------------------------------------
def test_repository_index_lists_pointers(tmp_path):
    state, model, repo = _state(tmp_path)
    try:
        rows = repository_index(repo, None)
        names = [r["name"] for r in rows]
        assert names == ["ckpt0", "ckpt1"]  # eval_artifact filtered out
        assert all(r["state"] == "AVAILABLE" for r in rows)
        assert rows[1]["held_out_exact_match"] == 0.6
        rows = repository_index(repo, {"name": "ckpt1"})
        assert [r["state"] for r in rows] == ["AVAILABLE", "READY"]
    finally:
        state.close()


def test_repository_index_lists_bare_orbax_trees(tmp_path):
    """A direct orbax tree with no curated pointer (the committed
    tiny-digits-* family artifacts) is loadable via the direct path, so
    the index must list it; pointer-referenced trees must not be
    double-listed."""
    state, model, repo = _state(tmp_path)
    try:
        params = model.init(jax.random.PRNGKey(9))
        model.save_checkpoint(str(tmp_path / "repo" / "bare-tree"), params)
        (tmp_path / "repo" / "not-a-model").mkdir()  # no orbax markers
        rows = repository_index(repo, None)
        names = [r["name"] for r in rows]
        assert names == ["ckpt0", "ckpt1", "bare-tree"]
        bare = rows[-1]
        assert bare["state"] == "AVAILABLE" and bare["preset"] is None
        rows = repository_index(repo, {"name": "bare-tree"})
        assert [r["state"] for r in rows] == \
            ["AVAILABLE", "AVAILABLE", "READY"]
    finally:
        state.close()


def test_resolve_checkpoint_errors(tmp_path):
    state, model, repo = _state(tmp_path)
    try:
        with pytest.raises(ModelRepositoryError):
            resolve_checkpoint(repo, "nope")
        with pytest.raises(ModelRepositoryError):
            resolve_checkpoint(repo, "../escape")
        # pointer whose tree was wiped (the VM re-create scenario)
        (tmp_path / "repo" / "gone.json").write_text(
            json.dumps({"preset": "tiny",
                        "checkpoint": str(tmp_path / "repo" / "absent")}))
        with pytest.raises(ModelRepositoryError) as ei:
            resolve_checkpoint(repo, "gone")
        assert "not on disk" in str(ei.value)
        # a bare orbax tree directory resolves without a pointer
        assert resolve_checkpoint(repo, "tree0").endswith("tree0")
    finally:
        state.close()


def test_hot_swap_changes_serving_weights(tmp_path):
    state, model, repo = _state(tmp_path)
    try:
        pcm = np.random.default_rng(3).integers(
            -8000, 8000, 4000, dtype=np.int16)
        before = state.pipeline.process_batch_samples(
            pcm.astype(np.float32) / 32768.0)
        old_fp = _fingerprint(state.pipeline.params)
        info = hot_swap(state, "ckpt1")
        assert info["name"] == "ckpt1"
        assert state.loaded_model["name"] == "ckpt1"
        assert _fingerprint(state.pipeline.params) != old_fp
        # serving still works on the new weights, through the SAME
        # compiled bucket programs (params are jit arguments)
        after = state.pipeline.process_batch_samples(
            pcm.astype(np.float32) / 32768.0)
        assert after is not None and before is not None
        # swapping back to seed-0 weights reproduces the original decode
        hot_swap(state, "ckpt0")
        again = state.pipeline.process_batch_samples(
            pcm.astype(np.float32) / 32768.0)
        assert again.text == before.text
        assert state.metrics.model_reloads == 2
    finally:
        state.close()


def test_hot_swap_refreshes_fresh_pred_cache(tmp_path):
    state, model, repo = _state(tmp_path)
    try:
        _, st0 = state.pipeline._fresh_pred()
        assert hasattr(state.pipeline, "_fresh_cache")
        hot_swap(state, "ckpt1")
        assert not hasattr(state.pipeline, "_fresh_cache")
        _, st1 = state.pipeline._fresh_pred()
        # NOTE: with random-INIT checkpoints the fresh SOS step is
        # exactly zero for any weights (blank embeds to 0, biases init
        # to 0), so equality of values proves nothing here — the
        # invalidation itself is the contract (trained biases make the
        # fresh state weight-dependent)
        assert np.asarray(st1[0]).shape == np.asarray(st0[0]).shape
    finally:
        state.close()


def test_hot_swap_mismatched_tree_rejected(tmp_path):
    state, model, repo = _state(tmp_path)
    try:
        # a checkpoint from a different architecture must 422 and leave
        # the serving weights untouched
        import dataclasses
        other = Transducer.from_preset("tiny")
        other = dataclasses.replace(
            other, config=dataclasses.replace(
                other.config, d_model=other.config.d_model * 2))
        bad = other.init(jax.random.PRNGKey(9))
        tree = tmp_path / "repo" / "badtree"
        other.save_checkpoint(str(tree), bad)
        (tmp_path / "repo" / "bad.json").write_text(json.dumps({
            "preset": "other", "checkpoint": str(tree)}))
        old_fp = _fingerprint(state.pipeline.params)
        from amira_rust_asr_server_tpu.runtime.reload import \
            CheckpointMismatchError
        with pytest.raises(CheckpointMismatchError):
            hot_swap(state, "bad")
        assert _fingerprint(state.pipeline.params) == old_fp
        assert state.loaded_model is None or \
            state.loaded_model.get("name") != "bad"
    finally:
        state.close()


def _presets():
    from amira_rust_asr_server_tpu.models.presets import PRESETS
    return PRESETS


def test_prepare_params_applies_bf16_and_sharding(tmp_path):
    import jax.numpy as jnp
    model = Transducer.from_preset("tiny")
    repo = _make_repo(tmp_path, model, seeds=(0,))
    params = model.init(jax.random.PRNGKey(0))
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 model_repo_path=repo, compute_dtype="bfloat16")
    pipeline = AsrPipeline(model, params, _vocab(), cfg)
    new, quant = prepare_params(pipeline, os.path.join(repo, "tree0"))
    leaves = jax.tree_util.tree_leaves(new)
    assert all(x.dtype != jnp.float32 for x in leaves)
    assert quant is None  # int8 decode weights off on CPU


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------
def _run(state, fn):
    async def go():
        app = create_app(state)
        async with TestClient(TestServer(app)) as client:
            return await fn(client)
    try:
        return asyncio.run(go())
    finally:
        state.close()


def test_http_repository_index_and_load(tmp_path):
    state, model, repo = _state(tmp_path)

    async def go(client):
        resp = await client.get("/v2/repository/index")
        assert resp.status == 200
        body = await resp.json()
        assert [m["name"] for m in body["models"]] == ["ckpt0", "ckpt1"]
        resp = await client.post("/v2/repository/models/ckpt1/load")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "success" and body["name"] == "ckpt1"
        assert body["swap_ms"] > 0
        resp = await client.get("/v2/repository/index")
        body = await resp.json()
        states = {m["name"]: m["state"] for m in body["models"]}
        assert states == {"ckpt0": "AVAILABLE", "ckpt1": "READY"}
        resp = await client.post("/v2/repository/models/absent/load")
        assert resp.status == 404
        # metrics surface records the reload
        resp = await client.get("/metrics")
        m = await resp.json()
        assert m["model_reloads"] == 1 and m["loaded_model"] == "ckpt1"

    _run(state, go)


def test_reload_refused_while_lanes_live(tmp_path):
    """Native streaming: a live lane pins the weights (409)."""
    model = Transducer.from_preset("tiny-streaming") \
        if "tiny-streaming" in _presets() else None
    if model is None:
        pytest.skip("no tiny causal preset")
    repo = _make_repo(tmp_path, model)
    params = model.init(jax.random.PRNGKey(0))
    cfg = Config(audio_sec_buckets=[0.5], batch_buckets=[1],
                 model_repo_path=repo, compute_dtype="float32",
                 streaming_mode="native", max_lanes=2,
                 warmup_on_start=False)
    pipeline = AsrPipeline(model, params, _vocab(), cfg)
    state = AppState(pipeline, _vocab(), cfg)
    try:
        assert state.lane_engine is not None
        lane = state.lane_engine.attach()
        assert lane is not None
        with pytest.raises(ReloadConflictError):
            hot_swap(state, "ckpt1")
        state.lane_engine.detach(lane)
        info = hot_swap(state, "ckpt1")
        assert info["name"] == "ckpt1"
        # the rebuilt engine serves the new weights and is warm
        assert state.lane_engine.warmed_up
        got = _fingerprint(state.lane_engine.params)
        want = _fingerprint(model.load_checkpoint(
            os.path.join(repo, "tree1")))
        assert abs(got - want) / max(want, 1e-9) < 1e-3
    finally:
        state.close()


def test_hot_swap_validate_and_rollback(tmp_path):
    """?validate runs a canary decode; a failing canary rolls back."""
    state, model, repo = _state(tmp_path)
    try:
        info = hot_swap(state, "ckpt1", validate=True)
        assert info["validated"] is True
        fp1 = _fingerprint(state.pipeline.params)

        # sabotage the canary: the next decode on the "new" weights fails
        orig = state.pipeline.process_batch_samples
        state.pipeline.process_batch_samples = \
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        from amira_rust_asr_server_tpu.runtime.reload import \
            CheckpointMismatchError
        with pytest.raises(CheckpointMismatchError) as ei:
            hot_swap(state, "ckpt0", validate=True)
        assert "rolled back" in str(ei.value)
        state.pipeline.process_batch_samples = orig
        # weights are back to ckpt1's, and serving works
        assert _fingerprint(state.pipeline.params) == fp1
        assert state.loaded_model["name"] == "ckpt1"
        pcm = np.zeros(2000, np.float32)
        assert state.pipeline.process_batch_samples(pcm) is not None
    finally:
        state.close()
