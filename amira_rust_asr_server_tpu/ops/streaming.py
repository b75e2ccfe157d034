"""TPU-native streaming encoder: chunked forward with HBM-resident cache.

This replaces the reference's streaming strategy — re-decoding overlapping
2 s windows and weaving transcripts (ref: src/asr/incremental.rs,
SURVEY.md §5 long-context) — with a *stateful chunked encoder*: each chunk
is encoded once, attending to a bounded left context carried across chunks
entirely on device:

- subsampler: last (kernel-1) input rows per stride-2 stage
- attention: rotary-encoded K/V of the last ``att_left`` encoder frames
  per layer (keys carry absolute positions, so chunked == full)
- conv module: last (kernel-1) post-GLU rows per layer

Exactness: with ``ModelConfig(causal=True, att_context=(L, 0))`` the
chunked forward is numerically equivalent to the batch forward (tested to
1e-4) — no window overlap, no re-decode, no transcript weaving.

The functions here are pure pytree programs over the flax parameter tree
(same params serve batch and streaming), jit-able per chunk-size bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import _rope
from ..models.presets import ModelConfig


# -- linen param helpers ----------------------------------------------------
def _dense(p: Dict, x: jax.Array) -> jax.Array:
    return x @ p["kernel"] + p["bias"]


def _layernorm(p: Dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _glu(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


# -- cache ------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncoderCache:
    """Per-stream device-resident encoder state."""

    sub_inputs: List[jax.Array]   # per stage: [B, 4, ch_in]
    attn_k: List[jax.Array]       # per layer: [B, H, L, dh] (rope'd)
    attn_v: List[jax.Array]       # per layer: [B, H, L, dh]
    conv_tail: List[jax.Array]    # per layer: [B, k-1, d_model]
    pos: jax.Array                # [B] int32 — encoder frames consumed


def init_encoder_cache(cfg: ModelConfig, batch: int = 1,
                       dtype=jnp.float32) -> EncoderCache:
    n_stages = int(np.log2(cfg.subsampling_factor))
    left = cfg.att_context[0]
    assert left >= 0, "streaming needs att_context=(L, 0) with finite L"
    dh = cfg.d_model // cfg.n_heads
    chans = [cfg.n_mels] + [cfg.subsampling_dim] * (n_stages - 1)
    return EncoderCache(
        sub_inputs=[jnp.zeros((batch, 4, c), dtype) for c in chans],
        attn_k=[jnp.zeros((batch, cfg.n_heads, left, dh), dtype)
                for _ in range(cfg.n_layers)],
        attn_v=[jnp.zeros((batch, cfg.n_heads, left, dh), dtype)
                for _ in range(cfg.n_layers)],
        conv_tail=[jnp.zeros((batch, cfg.conv_kernel - 1, cfg.d_model),
                             dtype) for _ in range(cfg.n_layers)],
        pos=jnp.zeros((batch,), jnp.int32),
    )


# -- streaming modules ------------------------------------------------------
def _sub_stage_stream(p: Dict, x: jax.Array, cache: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """One causal stride-2 conv stage on a chunk. x [B, t, cin] (t even),
    cache [B, 4, cin] -> ([B, t/2, cout], new cache)."""
    xin = jnp.concatenate([cache, x], axis=1)      # [B, t+4, cin]
    y = jax.lax.conv_general_dilated(
        xin, p["kernel"], window_strides=(2,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = y + p["bias"]
    return jax.nn.silu(y), xin[:, -4:]


def _mhsa_stream(p: Dict, cfg: ModelConfig, x_ln: jax.Array,
                 k_cache: jax.Array, v_cache: jax.Array, pos: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Streaming attention over [cache | chunk] keys.

    x_ln [B, t, d]; k/v_cache [B, H, L, dh]; pos [B] = per-lane absolute
    index of the chunk's first frame. Returns (out, new k/v caches).
    """
    b, t, d = x_ln.shape
    h = cfg.n_heads
    dh = d // h
    left = cfg.att_context[0]

    qkv = _dense(p["qkv"], x_ln)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    q = _rope(q, pos_offset=pos)
    k = _rope(k, pos_offset=pos)

    keys = jnp.concatenate([k_cache, k], axis=2)    # [B, H, L+t, dh]
    vals = jnp.concatenate([v_cache, v], axis=2)

    # scores in the activation dtype (matches the batch encoder's bf16
    # inference attention)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, keys)
    scores = scores / jnp.sqrt(jnp.asarray(dh, scores.dtype))

    q_pos = pos[:, None, None] + jnp.arange(t)[None, :, None]  # [B,t,1]
    k_pos = (pos[:, None, None] - left
             + jnp.arange(left + t)[None, None, :])            # [B,1,L+t]
    mask = (k_pos >= 0) & (k_pos <= q_pos) & (q_pos - k_pos <= left)
    scores = jnp.where(mask[:, None], scores,
                       jnp.asarray(-1e9, scores.dtype))
    attn = jax.nn.softmax(scores, axis=-1).astype(x_ln.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _dense(p["out"], out), keys[:, :, -left:], vals[:, :, -left:]


def _conv_stream(p: Dict, cfg: ModelConfig, x_ln: jax.Array,
                 tail: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Streaming conformer conv module. tail [B, k-1, d] is the previous
    chunk's post-GLU rows."""
    g = _glu(_dense(p["pw1"], x_ln))                # [B, t, d]
    gin = jnp.concatenate([tail, g], axis=1)        # [B, t+k-1, d]
    y = jax.lax.conv_general_dilated(
        gin, p["dw"]["kernel"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.d_model)
    y = y + p["dw"]["bias"]
    y = _layernorm(p["norm"], y)
    y = jax.nn.silu(y)
    return _dense(p["pw2"], y), gin[:, -(cfg.conv_kernel - 1):]


def _ff(p: Dict, x: jax.Array) -> jax.Array:
    return _dense(p["w2"], jax.nn.silu(_dense(p["w1"], x)))


def _moe_ff(p: Dict, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """Streaming mirror of encoder.MoEFeedForward (same math, raw pytree).
    Stateless per-frame, so chunked == batch holds with no extra cache."""
    e = cfg.moe_experts
    k = min(cfg.moe_top_k, e)
    logits = jnp.dot(x, p["gate"])
    top_vals, _ = jax.lax.top_k(logits, k)
    selected = logits >= top_vals[..., -1:]
    masked = jnp.where(selected, logits, jnp.asarray(-1e9, logits.dtype))
    combine = jax.nn.softmax(masked, axis=-1)
    h = jnp.einsum("btd,edf->ebtf", x, p["w1"]) + p["b1"][:, None, None, :]
    h = jax.nn.silu(h)
    y = jnp.einsum("ebtf,efd->ebtd", h, p["w2"]) + p["b2"][:, None, None, :]
    return jnp.einsum("ebtd,bte->btd", y, combine)


def encode_chunk(enc_params: Dict, cfg: ModelConfig, feats: jax.Array,
                 cache: EncoderCache
                 ) -> Tuple[jax.Array, EncoderCache]:
    """Streaming encoder step.

    feats [B, n_mels, Tc] with Tc a multiple of the subsampling factor;
    returns ([B, Tc/k, d_enc], new cache). Pure function — jit per
    chunk-size bucket.
    """
    assert cfg.causal, "streaming encoder requires causal=True"
    x = jnp.transpose(feats, (0, 2, 1))             # [B, Tc, n_mels]
    n_stages = int(np.log2(cfg.subsampling_factor))
    sub = enc_params["subsampler"]
    new_sub: List[jax.Array] = []
    for i in range(n_stages):
        x, c = _sub_stage_stream(sub[f"conv{i}"], x, cache.sub_inputs[i])
        new_sub.append(c)
    x = _dense(sub["proj"], x)                      # [B, t, d_model]

    new_k: List[jax.Array] = []
    new_v: List[jax.Array] = []
    new_tail: List[jax.Array] = []
    for i in range(cfg.n_layers):
        p = enc_params[f"block{i}"]

        def gained(branch, gname, p=p):
            # LayerScale parity with ConformerBlock._gain (identity when
            # the checkpoint has no gains)
            return p[gname] * branch if gname in p else branch

        x = x + gained(0.5 * _ff(p["ff1"], _layernorm(p["ln_ff1"], x)),
                       "ls_ff1")
        attn_out, k2, v2 = _mhsa_stream(
            p["mhsa"], cfg, _layernorm(p["ln_mhsa"], x),
            cache.attn_k[i], cache.attn_v[i], cache.pos)
        x = x + gained(attn_out, "ls_mhsa")
        conv_out, tail2 = _conv_stream(
            p["conv"], cfg, _layernorm(p["ln_conv"], x),
            cache.conv_tail[i])
        x = x + gained(conv_out, "ls_conv")
        x_ff2 = _layernorm(p["ln_ff2"], x)
        ff2_out = (_moe_ff(p["ff2"], cfg, x_ff2) if cfg.moe_experts > 0
                   else _ff(p["ff2"], x_ff2))
        x = x + gained(0.5 * ff2_out, "ls_ff2")
        x = _layernorm(p["ln_out"], x)
        new_k.append(k2)
        new_v.append(v2)
        new_tail.append(tail2)

    enc = _dense(enc_params["out_proj"], x)         # [B, t, d_enc]
    new_cache = EncoderCache(
        sub_inputs=new_sub, attn_k=new_k, attn_v=new_v,
        conv_tail=new_tail, pos=cache.pos + x.shape[1])
    return enc, new_cache
