"""Live checkpoint reload: in-process model-repository management.

The reference never manages model lifecycle itself — it delegates to
Triton's repository API (ref: src/constants.rs:291-292
``DEFAULT_MODEL_REPO``; readiness polling via
``MODEL_READY_TIMEOUT_SECS``, src/constants.rs:115): operators drop a
new version into the repo and ask Triton to (re)load it while the Rust
server keeps its connections up.  This framework executes in-process,
so the equivalent capability — swap serving weights without a restart
and without dropping connections — has to live here.

Why a hot swap is cheap on this stack: parameters are jit ARGUMENTS
everywhere (never closure constants — see ``AsrPipeline._fwd`` /
``StreamingLaneEngine.step``), so replacing the weight arrays does not
touch any compiled program.  The next dispatch simply carries the new
arrays.  The swap itself runs ON the single device-dispatch thread
(``AppState.inference_executor``), which makes it atomic with respect
to every forward pass by construction: no batch can be mid-flight on
another thread because there is no other dispatch thread.

What a swap must (re)do — mirrors ``AsrPipeline.__init__``'s load-time
transforms exactly (runtime/pipeline.py):

* restore the orbax tree against the CURRENT model's abstract template
  (orbax validates structure + shapes, so an incompatible checkpoint is
  rejected before anything is mutated);
* re-apply tensor-parallel shardings when serving over a mesh;
* one jitted bf16 cast (per-leaf host casts would be hundreds of tiny
  dispatches over the high-latency axon link);
* re-quantize the int8-resident decode-kernel LSTM weights;
* drop ``AsrPipeline._fresh_cache`` (the cached SOS prediction-net
  output embeds the OLD weights).

The native streaming lane engine pre-bakes a handful of tiny
weight-derived closure constants (the fresh-lane reset values,
lane_engine.py ``reset_lane``), so it cannot take a params assignment
alone: ``hot_swap`` rebuilds the engine and re-warms it, gated on zero
live lanes — the operational contract is "drain streams, then reload",
which is also how a Triton reload behaves for stateful sequence slots.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

from ..errors import AppError

log = logging.getLogger("asr.reload")


class ModelRepositoryError(AppError):
    """Unknown model name / missing checkpoint tree in the repository."""
    http_status = 404
    code = "model_not_found"


class ReloadConflictError(AppError):
    """Reload refused because serving state pins the current weights
    (live native-streaming lanes, or another reload in flight)."""
    http_status = 409
    code = "reload_conflict"


class CheckpointMismatchError(AppError):
    """Checkpoint tree does not fit the serving model's parameter
    structure (wrong preset / architecture)."""
    http_status = 422
    code = "checkpoint_mismatch"


# ---------------------------------------------------------------------------
# repository index
# ---------------------------------------------------------------------------
def _pointer_files(repo_dir: str):
    try:
        names = sorted(os.listdir(repo_dir))
    except OSError:
        return
    for fn in names:
        if not fn.endswith(".json"):
            continue
        path = os.path.join(repo_dir, fn)
        try:
            with open(path, "r", encoding="utf-8") as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        # a model pointer names its orbax tree; anything else (vocab
        # manifests, eval artifacts) is not a loadable model
        if isinstance(doc, dict) and "checkpoint" in doc:
            yield fn[:-len(".json")], doc


def resolve_checkpoint(repo_dir: str, name: str) -> str:
    """Map a repository model name to an orbax checkpoint directory.

    ``name`` resolves through ``<repo>/<name>.json`` (the curated
    pointer format this repo trains into, e.g.
    model-repo/large-synth-v2.json) or directly to ``<repo>/<name>``
    when that is itself an orbax tree.  Pointer ``checkpoint`` paths
    are kept relative to the process CWD (how the pointers are
    written) with a fallback relative to the repo's parent.
    """
    if os.sep in name or name.startswith("."):
        raise ModelRepositoryError(f"invalid model name {name!r}")
    ptr = os.path.join(repo_dir, name + ".json")
    if os.path.isfile(ptr):
        with open(ptr, "r", encoding="utf-8") as f:
            doc = json.load(f)
        ckpt = doc.get("checkpoint")
        if not ckpt:
            raise ModelRepositoryError(
                f"pointer {ptr} has no 'checkpoint' field")
        if not os.path.isdir(ckpt):
            alt = os.path.join(os.path.dirname(repo_dir) or ".", ckpt)
            if os.path.isdir(alt):
                ckpt = alt
        if not os.path.isdir(ckpt):
            raise ModelRepositoryError(
                f"model {name!r}: checkpoint tree {ckpt!r} not on disk "
                f"(gitignored trees do not survive VM re-creates; retrain "
                f"or restore before loading)")
        return ckpt
    direct = os.path.join(repo_dir, name)
    if os.path.isdir(direct):
        return direct
    raise ModelRepositoryError(f"model {name!r} not in repository "
                               f"{repo_dir!r}")


def repository_index(repo_dir: str,
                     loaded: Optional[dict] = None) -> list:
    """Triton-parity repository listing (``POST /v2/repository/index``
    shape: name/version/state rows), enriched with this repo's curated
    quality fields so operators can pick a checkpoint from the index
    alone."""
    loaded_name = (loaded or {}).get("name")
    rows = []
    for name, doc in _pointer_files(repo_dir) or ():
        ckpt = doc.get("checkpoint", "")
        available = os.path.isdir(ckpt) or os.path.isdir(
            os.path.join(os.path.dirname(repo_dir) or ".", ckpt))
        row = {
            "name": name,
            "preset": doc.get("preset"),
            "checkpoint": ckpt,
            "state": ("READY" if name == loaded_name
                      else "AVAILABLE" if available
                      else "UNAVAILABLE"),
        }
        for k in ("held_out_exact_match", "held_out_token_error_rate",
                  "steps", "family"):
            if k in doc:
                row[k] = doc[k]
        rows.append(row)
    # direct orbax trees with no curated pointer (e.g. the committed
    # tiny-digits-* family artifacts) are loadable via resolve_checkpoint's
    # direct path — list them too, or the index under-reports what
    # POST /v2/repository/models/{name}/load accepts
    named = {r["name"] for r in rows}
    pointed = {os.path.normpath(r["checkpoint"]) for r in rows
               if r.get("checkpoint")}
    try:
        entries = sorted(os.listdir(repo_dir))
    except OSError:
        entries = []
    for fn in entries:
        path = os.path.join(repo_dir, fn)
        if (fn in named or not os.path.isdir(path)
                or os.path.normpath(path) in pointed):
            continue
        # an orbax tree carries its own metadata marker files
        if not (os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
                or os.path.exists(os.path.join(path, "manifest.ocdbt"))):
            continue
        rows.append({
            "name": fn,
            "preset": None,
            "checkpoint": path,
            "state": "READY" if fn == loaded_name else "AVAILABLE",
        })
    return rows


# ---------------------------------------------------------------------------
# parameter preparation + swap
# ---------------------------------------------------------------------------
def prepare_params(pipeline, checkpoint_path: str):
    """Restore + re-apply the pipeline's load-time transforms.

    Returns ``(params, pred_quant)`` ready for assignment.  Pure
    preparation — nothing in the serving state is touched, so a failure
    here leaves the old weights serving untouched.
    """
    import jax
    import jax.numpy as jnp

    model = pipeline.model
    try:
        # load_checkpoint templates via eval_shape when like=None
        params = model.load_checkpoint(checkpoint_path)
    except AppError:
        raise
    except Exception as e:  # orbax raises library-specific types
        raise CheckpointMismatchError(
            f"checkpoint {checkpoint_path!r} does not match the serving "
            f"model's parameter tree: {e}") from e
    # orbax validates tree STRUCTURE against the template but restores
    # whatever array shapes were saved — a same-topology/different-dims
    # checkpoint (wrong preset) restores "successfully" and would only
    # blow up at the next dispatch. Enforce shapes here, before any
    # serving state is touched.
    template = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    bad = []
    for (kp, want), (_, got) in zip(
            jax.tree_util.tree_leaves_with_path(template),
            jax.tree_util.tree_leaves_with_path(params)):
        if tuple(want.shape) != tuple(got.shape):
            bad.append(f"{jax.tree_util.keystr(kp)}: "
                       f"{tuple(got.shape)} != {tuple(want.shape)}")
    if bad:
        raise CheckpointMismatchError(
            f"checkpoint {checkpoint_path!r} shapes do not fit the "
            f"serving model ({len(bad)} mismatched): " + "; ".join(bad[:5]))
    if pipeline.mesh is not None:
        from ..parallel import shard_params
        params = shard_params(pipeline.mesh, params)
    if pipeline.compute_dtype == jnp.bfloat16:
        cast = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p))
        params = cast(params)
    pred_quant = None
    if pipeline._pred_quant is not None:
        from ..ops.pallas.decode_loop import quantize_pred_lstm
        pred_quant = jax.jit(quantize_pred_lstm)(params["predictor"])
    return params, pred_quant


def _swap_pipeline(pipeline, params, pred_quant) -> None:
    """Runs ON the device-dispatch thread: no forward can interleave."""
    pipeline.params = params
    if pred_quant is not None:
        pipeline._pred_quant = pred_quant
    # cached SOS prediction output embeds the old weights
    if hasattr(pipeline, "_fresh_cache"):
        del pipeline._fresh_cache


def _rebuild_lane_engine(state, params):
    """Fresh StreamingLaneEngine on the new weights, warmed before it is
    installed.  The fused chunk-step program is byte-identical to the
    old engine's (params are arguments), so the re-trace hits the
    persistent compilation cache."""
    from .lane_engine import StreamingLaneEngine
    old = state.lane_engine
    eng = StreamingLaneEngine(
        state.pipeline.model, params, state.vocab,
        n_lanes=old.n_lanes, chunk_frames=old.chunk_frames,
        norm=old.norm, max_symbols=old._max_symbols,
        max_total=old._max_total, mesh=old.mesh)
    eng.prometheus = old.prometheus
    took = eng.warm()
    log.info("reload: lane engine rebuilt + warmed in %.1fs", took)
    return eng


def _smoke_decode(pipeline) -> None:
    """One tiny decode through the serving path on whatever weights are
    installed — raises if the swapped tree can't actually serve."""
    import numpy as np
    n = int(0.25 * 16000)
    tone = (0.1 * np.sin(2 * np.pi * 440.0 *
                         np.arange(n) / 16000.0)).astype(np.float32)
    pipeline.process_batch_samples(tone)


def hot_swap(state, name: str, validate: bool = False) -> dict:
    """Load ``name`` from the repository and swap it into serving.

    Orchestration (called from a session-executor thread, never the
    event loop):

    1. resolve + restore + transform (old weights keep serving);
    2. if native streaming is on: refuse while lanes are live, else
       rebuild + warm a fresh lane engine on the new weights;
    3. assign pipeline params on the dispatch thread (atomic w.r.t.
       every batch forward);
    4. install the new lane engine and record the load.

    In-flight batch requests complete on whichever weights their
    dispatch picked up — the same guarantee a Triton reload gives.
    """
    if not getattr(state, "_reload_lock", None):
        import threading
        state._reload_lock = threading.Lock()
    if not state._reload_lock.acquire(blocking=False):
        raise ReloadConflictError("another reload is in flight")
    try:
        t0 = time.perf_counter()
        repo = state.config.model_repo_path
        ckpt = resolve_checkpoint(repo, name)
        eng = state.lane_engine
        if eng is not None and eng.live_lanes > 0:
            raise ReloadConflictError(
                f"{eng.live_lanes} native streaming lane(s) live; drain "
                f"streams before reloading")
        params, pred_quant = prepare_params(state.pipeline, ckpt)
        new_eng = None
        if eng is not None:
            new_eng = _rebuild_lane_engine(state, params)
            # a stream that attached while the new engine warmed pins
            # the OLD weights; surface the conflict rather than serve
            # mixed generations across the two paths
            if eng.live_lanes > 0:
                raise ReloadConflictError(
                    "stream attached during reload; drain and retry")
        old_params = state.pipeline.params
        old_quant = state.pipeline._pred_quant
        state.inference_executor.submit(
            _swap_pipeline, state.pipeline, params, pred_quant).result()
        if validate:
            # canary: one smoke decode on the new weights; on ANY failure
            # roll back to the retained old arrays and surface the error.
            # Triton offers nothing equivalent — a bad model version there
            # serves errors until an operator intervenes.
            try:
                state.inference_executor.submit(
                    _smoke_decode, state.pipeline).result()
            except Exception as e:
                state.inference_executor.submit(
                    _swap_pipeline, state.pipeline, old_params,
                    old_quant).result()
                raise CheckpointMismatchError(
                    f"validation decode failed on {name!r}; rolled back "
                    f"to previous weights: {e}") from e
        if new_eng is not None:
            with state.lane_lock:
                state.lane_engine = new_eng
        took_ms = (time.perf_counter() - t0) * 1e3
        info = {"name": name, "checkpoint": ckpt,
                "swap_ms": round(took_ms, 1), "ts": time.time(),
                "validated": bool(validate)}
        state.loaded_model = info
        state.metrics.record_model_reload(name)
        if getattr(state, "prometheus", None) is not None:
            state.prometheus.model_reloads.inc()
        log.info("reload: now serving %s (%s) — %.0f ms", name, ckpt,
                 took_ms)
        return info
    finally:
        state._reload_lock.release()
