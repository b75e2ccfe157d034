"""Encoder segment attribution: where the non-MXU ~20% goes.

Times the full flagship encoder and each conformer sub-module (MHSA,
ConvModule, FeedForward, LayerNorm) in isolation at the exact serving
shapes (B x T' x d_model after subsampling), so the bandwidth-bound
residue (conv-module VPU work, layernorms, softmax) is MEASURED before
any fusion work is attempted (round-3 verdict item 9: numbers first,
chase only a >=5% e2e lever).

    python tools/profile_encoder.py --preset large [--batch 16 --secs 30]

Prints one JSON line: full-encoder ms + per-module ms and their share of
a block, plus the e2e share each category could possibly return if made
free (upper bound on any fusion win).

Timing recipe per CLAUDE.md: chain dispatches on data dependency, end
with a host readback (block_until_ready on axon can return early), warm
first.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))

import argparse
import json
import time


def timeit(fn, x, iters=20):
    """Steady-state s/call: fn(x)->array chained on its own output shape."""
    import numpy as np
    out = fn(x)
    np.asarray(out).ravel()[:1]  # compile + warm, host readback
    t0 = time.time()
    for _ in range(iters):
        out = fn(out) if out.shape == x.shape and out.dtype == x.dtype \
            else fn(x)
    np.asarray(out).ravel()[:1]
    return (time.time() - t0) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="large")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--secs", type=float, default=30.0)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.models.encoder import (ConformerBlock,
                                                          ConvModule,
                                                          FeedForward, MHSA)
    from amira_rust_asr_server_tpu.ops import log_mel_features
    import flax.linen as nn

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=_sys.stderr, flush=True)

    model = Transducer.from_preset(args.preset)
    cfg = model.config
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = model.load_checkpoint(str(pathlib.Path(args.checkpoint)
                                           .resolve()), like=params)
    dt = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, params)

    b = args.batch
    n = int(args.secs * 16000)
    t_mel = 1 + n // 160
    t_sub = t_mel
    for _ in range(int(np.log2(cfg.subsampling_factor))):
        t_sub = (t_sub + 1) // 2
    d = cfg.d_model
    rng = np.random.default_rng(0)

    # -- full encoder (mel -> enc), serving shapes ------------------------
    audio = jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32)
    lens = jnp.full((b,), n, jnp.int32)

    @jax.jit
    def full_encode(audio):
        feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
        enc, _ = model.encode(params, feats.astype(dt), fl)
        return enc

    # chain on audio identity (same shape/dtype) for dependency
    enc_s = timeit(full_encode, audio, args.iters)

    # -- sub-modules at block shapes [B, T', D] ----------------------------
    x = jnp.asarray(rng.standard_normal((b, t_sub, d)) * 0.1, dt)
    pad_mask = jnp.ones((b, t_sub), bool)
    block_params = params["encoder"]["block0"]

    mhsa = MHSA(cfg)
    conv = ConvModule(cfg)
    ff = FeedForward(cfg)
    ln = nn.LayerNorm()
    ln_params = {"params": block_params["ln_mhsa"]}

    mods = {
        "mhsa": jax.jit(lambda v: mhsa.apply(
            {"params": block_params["mhsa"]}, v, pad_mask)),
        "conv_module": jax.jit(lambda v: conv.apply(
            {"params": block_params["conv"]}, v, pad_mask)),
        "feed_forward": jax.jit(lambda v: ff.apply(
            {"params": block_params["ff1"]}, v)),
        "layernorm": jax.jit(lambda v: ln.apply(ln_params, v)),
        "block": jax.jit(lambda v: ConformerBlock(cfg).apply(
            {"params": block_params}, v, pad_mask)),
    }
    rows = {}
    for name, fn in mods.items():
        rows[name] = timeit(fn, x, args.iters)
        print(f"{name:14s} {rows[name]*1e3:8.3f} ms", file=_sys.stderr,
              flush=True)

    n_blocks = cfg.n_layers
    # per-block LN count: ln_ff1/ln_mhsa/ln_conv/ln_ff2/ln_out + the one
    # inside the conv module (already inside conv_module's time)
    ln_per_block = 5
    out = {
        "preset": args.preset,
        "batch": b,
        "secs": args.secs,
        "t_sub": int(t_sub),
        "encoder_ms": round(enc_s * 1e3, 3),
        "block_ms": round(rows["block"] * 1e3, 3),
        "blocks": n_blocks,
        "modules_ms": {k: round(v * 1e3, 4) for k, v in rows.items()
                       if k != "block"},
        # upper bound on e2e return if a category became FREE
        "e2e_share_if_free": {
            "conv_module": round(
                rows["conv_module"] * n_blocks / enc_s, 4),
            "layernorms": round(
                rows["layernorm"] * ln_per_block * n_blocks / enc_s, 4),
            "mhsa": round(rows["mhsa"] * n_blocks / enc_s, 4),
            "ff_both": round(2 * rows["feed_forward"] * n_blocks / enc_s,
                             4),
        },
        # how much of a block the summed pieces explain (fusion headroom
        # shows up as block_ms < sum of isolated pieces)
        "block_sum_ms": round(
            (rows["mhsa"] + rows["conv_module"] + 2 * rows["feed_forward"]
             + ln_per_block * rows["layernorm"]) * 1e3, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
