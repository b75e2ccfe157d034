"""Pipeline parallelism (GPipe) for the conformer encoder.

The reference scales by stateless replicas only (SURVEY.md §2.9); the
TP story here (mesh.py) shards weights *within* every matmul. This
module adds the third axis: **pipeline parallelism** — the 17-block
conformer stack is cut into S stages, each stage's blocks live on one
device (or one TP group), and microbatches flow stage-to-stage over ICI
via ``jax.lax.ppermute`` inside a ``shard_map``. XLA sees a static
schedule (one ``lax.scan`` over GPipe ticks), so the whole pipeline is
ONE compiled program — no host round-trips between stages.

Design notes (TPU-first):
- Conformer blocks are structurally identical, so all L blocks stack
  into one pytree with a leading [S, L/S, ...] axis; dim 0 is sharded
  over the ``stage`` mesh axis. Each stage applies its L/S blocks with a
  ``lax.scan`` over the local slice (same trick XLA uses for remat'd
  uniform stacks).
- The GPipe schedule is the classic (M + S - 1)-tick wavefront: tick t
  feeds microbatch t into stage 0; every stage processes its resident
  activation and ppermutes the result to stage i+1; the last stage
  banks one finished microbatch per tick from tick S-1 on. Bubble
  fraction = (S-1)/(M+S-1), amortized by choosing M >= S.
- Activations between stages are [Bm, T', d_model] — time-contiguous,
  so the ppermute rides ICI at full bandwidth (no relayout).
- Autodiff: ``ppermute``/``scan``/``shard_map`` are all differentiable,
  so the same function trains under ``value_and_grad`` — the backward
  pass is the reverse wavefront (grads ppermute stage i -> i-1).

This is deliberately encoder-only: the prediction net + joint are ~2%
of flagship FLOPs (PARITY.md segment breakdown) and stay replicated on
the last stage's group.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D pipeline mesh. Composable in principle with data/model axes;
    kept 1-D here because the dryrun validates each axis separately."""
    devices = list(devices if devices is not None else jax.devices())
    if n_stages > len(devices):
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), (STAGE_AXIS,))


def stack_block_params(enc_params, n_layers: int):
    """[block0..block{L-1}] param dicts -> one pytree with leading [L]
    axis, plus the non-block remainder (subsampler, out_proj, ...)."""
    blocks = [enc_params[f"block{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in enc_params.items()
            if not k.startswith("block")}
    return stacked, rest


def _apply_block(cfg, block_params, x, pad_mask):
    from ..models.encoder import ConformerBlock
    return ConformerBlock(cfg).apply({"params": block_params}, x, pad_mask)


def pipeline_encode(model, params, features: jax.Array, lengths: jax.Array,
                    mesh: Mesh, n_microbatches: int,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Encoder forward with the block stack pipelined over ``mesh``.

    Same contract as ``Transducer.encode``: [B, n_mels, T] + [B] ->
    ([B, T', d_enc], [B]). Equal to the single-device forward (the
    blocks run in the same order with the same math; only placement
    changes) — locked by tests/test_pipeline_parallel.py.
    """
    from ..models.encoder import Subsampler

    cfg = model.config
    enc_params = params["encoder"]
    s = mesh.shape[STAGE_AXIS]
    l = cfg.n_layers
    if l % s != 0:
        raise ValueError(f"n_layers {l} not divisible by {s} stages")
    m = n_microbatches
    b = features.shape[0]
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    bm = b // m

    # -- non-pipelined prologue (identical math to ConformerEncoder) -----
    x = jnp.transpose(features, (0, 2, 1))
    x = Subsampler(cfg).apply(
        {"params": enc_params["subsampler"]}, x, lengths)
    t_sub = x.shape[1]
    enc_lens = lengths
    for _ in range(int(np.log2(cfg.subsampling_factor))):
        enc_lens = (enc_lens + 1) // 2
    enc_lens = enc_lens.astype(jnp.int32)
    pad_mask = jnp.arange(t_sub)[None, :] < enc_lens[:, None]
    x = jnp.where(pad_mask[:, :, None], x, 0.0)

    # -- stage-sharded block stack ---------------------------------------
    stacked, _ = stack_block_params(enc_params, l)
    # [L, ...] -> [S, L/S, ...]; dim 0 lives on the stage axis
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((s, l // s) + a.shape[1:]), stacked)
    staged = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(STAGE_AXIS))), staged)

    x_mb = x.reshape(m, bm, t_sub, x.shape[-1])
    mask_mb = pad_mask.reshape(m, bm, t_sub)

    block_specs = jax.tree_util.tree_map(lambda _: P(STAGE_AXIS), staged)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), block_specs),
        out_specs=P(),
        check_vma=False)
    def gpipe(x_mb, mask_mb, blocks_local):
        # local views: x_mb/mask_mb replicated; blocks_local [1, L/S, ...]
        blocks_local = jax.tree_util.tree_map(
            lambda a: a[0], blocks_local)
        stage = jax.lax.axis_index(STAGE_AXIS)
        n_ticks = m + s - 1

        def run_stage(x, mask):
            def body(h, bp):
                return _apply_block(cfg, bp, h, mask), None
            h, _ = jax.lax.scan(body, x, blocks_local)
            return h

        def tick(carry, t):
            buf, out = carry
            # stage 0 ingests microbatch t (zeros past the wave)
            feed = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.minimum(t, m - 1), axis=0, keepdims=False)
            buf = jnp.where(stage == 0, feed, buf)
            mask_idx = jnp.clip(t - stage, 0, m - 1)
            mask = jax.lax.dynamic_index_in_dim(
                mask_mb, mask_idx, axis=0, keepdims=False)
            h = run_stage(buf, mask)
            # last stage banks microbatch t-(S-1) once the wave arrives
            bank = jnp.where(
                (stage == s - 1) & (t >= s - 1)
                & (mask_idx == t - (s - 1)), 1.0, 0.0).astype(h.dtype)
            idx = jnp.maximum(t - (s - 1), 0)
            prev = jax.lax.dynamic_index_in_dim(
                out, idx, axis=0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, prev * (1 - bank) + h * bank, idx, axis=0)
            # hand activations downstream: stage i -> i+1
            nxt = jax.lax.ppermute(
                h, STAGE_AXIS, [(i, i + 1) for i in range(s - 1)])
            return (nxt, out), None

        buf0 = jnp.zeros_like(x_mb[0])
        out0 = jnp.zeros_like(x_mb)
        (_, out), _ = jax.lax.scan(
            tick, (buf0, out0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; sum-over-stages is a
        # cheap way to express "broadcast from last stage" in SPMD
        return jax.lax.psum(
            jnp.where(stage == s - 1, out, jnp.zeros_like(out)),
            STAGE_AXIS)

    y = gpipe(x_mb, mask_mb, staged).reshape(b, t_sub, -1)

    # -- epilogue: out projection + padding mask (same as encoder) -------
    op = enc_params["out_proj"]
    y = jnp.dot(y, op["kernel"]) + op["bias"]
    y = jnp.where(pad_mask[:, :, None], y, 0.0)
    return y, enc_lens
