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
    """Steady-state s/call via two-point slope: (T(2N)-T(N))/N.

    Measured on axon (round 5): every timing loop carries a ~600 ms FIXED
    cost (queue flush + readback RTT) regardless of iteration count — a
    trivial jitted program reads 141 ms/call at N=5 and 30 ms/call at
    N=20, both ≈600-700 ms total. A single mean therefore overstates any
    sub-RTT program by the amortized fixed cost; the slope between two
    loop lengths cancels it exactly."""
    import numpy as np
    out = fn(x)
    np.asarray(out).ravel()[:1]  # compile + warm, host readback

    chain = out.shape == x.shape and out.dtype == x.dtype

    def loop(n):
        o = x
        t0 = time.time()
        for _ in range(n):
            o = fn(o) if chain else fn(x)
        np.asarray(o).ravel()[:1]
        return time.time() - t0

    t1 = loop(iters)
    t2 = loop(2 * iters)
    return max((t2 - t1) / iters, 1e-9)


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

    # params MUST be a jit argument, not a closure constant: baking the
    # 421M tree into the HLO makes the remote-compile payload ~840 MB ->
    # HTTP 413 (CLAUDE.md gotcha; hit for real in the round-5 capture).
    @jax.jit
    def full_encode(p, audio):
        feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
        enc, _ = model.encode(p, feats.astype(dt), fl)
        return enc

    # chain on audio identity (same shape/dtype) for dependency
    enc_s = timeit(lambda v: full_encode(params, v), audio, args.iters)

    # -- sub-modules at block shapes [B, T', D] ----------------------------
    x = jnp.asarray(rng.standard_normal((b, t_sub, d)) * 0.1, dt)
    pad_mask = jnp.ones((b, t_sub), bool)
    block_params = params["encoder"]["block0"]

    mhsa = MHSA(cfg)
    conv = ConvModule(cfg)
    ff = FeedForward(cfg)
    ln = nn.LayerNorm()
    ln_params = {"params": block_params["ln_mhsa"]}

    # Sub-modules cost ~0.03-2 ms each — far below the tunnel's per-loop
    # noise (~±50 ms on a ~600 ms fixed flush+readback cost), so even the
    # loop-count slope reads zero (measured: all five modules clamped to
    # 0.000 at reps=64/iters=5). Resolve them with an IN-PROGRAM rep
    # slope instead: compile each module at two fori_loop trip counts
    # (R1, R2) and take per_rep = (T(R2) - T(R1)) / (R2 - R1), each T a
    # median-of-3 single-dispatch wall time ending in a host readback.
    # The fixed tunnel cost cancels exactly and the difference carries
    # 150-500 ms of pure compute signal. Params ride as jit ARGUMENTS
    # per the 413 rule; the loop carry is the data dependency, so XLA
    # cannot elide iterations.
    def repeat_jit(apply_fn, reps):
        def run(p, v):
            return jax.lax.fori_loop(
                0, reps, lambda i, o: apply_fn(p, o), v)
        return jax.jit(run)

    def dispatch_time(jfn, p, v):
        """Median-of-3 single-dispatch seconds, readback-terminated."""
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jfn(p, v)).ravel()[:1]
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    def rep_slope(apply_fn, p, v, r1, r2, name):
        j1, j2 = repeat_jit(apply_fn, r1), repeat_jit(apply_fn, r2)
        np.asarray(j1(p, v)).ravel()[:1]  # compile + warm
        np.asarray(j2(p, v)).ravel()[:1]
        t1, t2 = dispatch_time(j1, p, v), dispatch_time(j2, p, v)
        print(f"  {name}: T({r1})={t1*1e3:.1f} ms  T({r2})={t2*1e3:.1f} ms",
              file=_sys.stderr, flush=True)
        return max((t2 - t1) / (r2 - r1), 1e-9)

    # (R1, R2) sized so R2-R1 carries >=150 ms of compute at the
    # roofline-estimated per-rep cost of each module.
    mods = {
        "mhsa": (lambda p, v: mhsa.apply(p, v, pad_mask),
                 {"params": block_params["mhsa"]}, 512, 2048),
        "conv_module": (lambda p, v: conv.apply(p, v, pad_mask),
                        {"params": block_params["conv"]}, 512, 2048),
        "feed_forward": (lambda p, v: ff.apply(p, v),
                         {"params": block_params["ff1"]}, 256, 1024),
        "layernorm": (lambda p, v: ln.apply(p, v),
                      ln_params, 2048, 8192),
        "block": (lambda p, v: ConformerBlock(cfg).apply(p, v, pad_mask),
                  {"params": block_params}, 128, 512),
    }
    rows = {}
    for name, (apply_fn, p, r1, r2) in mods.items():
        rows[name] = rep_slope(apply_fn, p, x, r1, r2, name)
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
