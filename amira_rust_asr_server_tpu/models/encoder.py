"""FastConformer-style speech encoder in flax.

Contract parity (ref: model-repo/encoder/config.pbtxt and
src/triton/model.rs:291-375): ``audio_signal [B, n_mels, T] + length [B]
-> outputs [B, d_enc, T'] + encoded_lengths [B]``.

TPU-first choices (vs a faithful port of a NeMo/ONNX conformer):
- 8x time subsampling via stride-2 separable convs — fewer frames means
  fewer autoregressive decode steps downstream, the dominant serving cost.
- Rotary position embeddings instead of Transformer-XL relative attention:
  same quality class, no [T, T] relative-bias gather, better XLA fusion.
- GroupNorm(1) in the conv module instead of BatchNorm: batch-size
  invariant, streaming-safe (no running stats across padded lanes).
- Optional limited attention context (att_context) producing a banded mask,
  the hook for the chunked-streaming encoder cache.

All ops are static-shaped; padding is handled by masks derived from
``lengths`` so one compiled program serves a whole length bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .presets import ModelConfig


def _rope(x: jax.Array, pos_offset=0) -> jax.Array:
    """Rotary position embedding over the last dim. x: [B, H, T, Dh];
    positions are absolute: pos_offset + [0..T). Streaming chunks pass
    their stream position so chunked == full; a per-lane [B] offset vector
    is accepted (batched streaming lanes at different stream positions)."""
    dh = x.shape[-1]
    half = dh // 2
    t = x.shape[-2]
    # angles always in f32: bf16 positions lose integer precision past ~256
    freqs = jnp.asarray(1.0 / (10000.0 ** (np.arange(0, half) / half)),
                        jnp.float32)
    offs = jnp.asarray(pos_offset, jnp.float32)
    if offs.ndim == 0:
        positions = offs + jnp.arange(t, dtype=jnp.float32)  # [T]
        angles = positions[:, None] * freqs[None, :]         # [T, half]
        cos = jnp.cos(angles).astype(x.dtype)
        sin = jnp.sin(angles).astype(x.dtype)
    else:
        positions = offs[:, None] + jnp.arange(t, dtype=jnp.float32)[None]
        angles = positions[:, :, None] * freqs[None, None, :]  # [B, T, half]
        cos = jnp.cos(angles).astype(x.dtype)[:, None, :, :]   # [B,1,T,half]
        sin = jnp.sin(angles).astype(x.dtype)[:, None, :, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class QDense(nn.Module):
    """Dense layer with an optional int8 (W8A8 dynamic) serving path.

    Param structure and init are identical to ``nn.Dense`` (names
    "kernel"/"bias", lecun-normal/zeros), so checkpoints and the training
    path are byte-compatible; ``quant=True`` (from
    ``ModelConfig.quant_int8``) reroutes the matmul through the int8 MXU
    (2x bf16 peak on v5e — see ops/quant.py)."""

    features: int
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.quant:
            from ..ops.quant import quant_dense
            return quant_dense(x, kernel, bias)
        return jnp.dot(x, kernel) + bias


class MHSA(nn.Module):
    """Multi-head self-attention with RoPE and padding/band masks."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array) -> jax.Array:
        cfg = self.config
        b, t, d = x.shape
        h = cfg.n_heads
        dh = d // h

        qkv = QDense(3 * d, quant=cfg.quant_int8, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        q, k = _rope(q), _rope(k)

        # scores stay in the activation dtype: a f32 [B, H, T, T] score
        # tensor doubles attention HBM traffic for no accuracy we need
        # (bf16 softmax is standard practice for inference)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        scores = scores / jnp.sqrt(jnp.asarray(dh, scores.dtype))

        mask = pad_mask[:, None, None, :]  # [B, 1, 1, T] keys
        left, right = cfg.att_context
        if cfg.causal and right < 0:
            right = 0  # causal mode implies no lookahead
        if left >= 0 or right >= 0:
            qi = jnp.arange(t)[:, None]
            ki = jnp.arange(t)[None, :]
            band = jnp.ones((t, t), bool)
            if left >= 0:
                band &= (qi - ki) <= left
            if right >= 0:
                band &= (ki - qi) <= right
            mask = mask & band[None, None, :, :]

        scores = jnp.where(mask, scores, jnp.asarray(-1e9, scores.dtype))
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return QDense(d, quant=cfg.quant_int8, name="out")(out)


class ConvModule(nn.Module):
    """Conformer conv module: pointwise-GLU > depthwise > norm > pointwise."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array) -> jax.Array:
        cfg = self.config
        d = x.shape[-1]
        x = QDense(2 * d, quant=cfg.quant_int8, name="pw1")(x)
        x = nn.glu(x, axis=-1)
        # zero padded positions so the depthwise conv doesn't smear them in
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        pad = ([(cfg.conv_kernel - 1, 0)] if cfg.causal
               else "SAME")
        x = nn.Conv(features=d, kernel_size=(cfg.conv_kernel,),
                    feature_group_count=d, padding=pad, name="dw")(x)
        # per-frame LayerNorm, not BatchNorm/GroupNorm: no running stats, no
        # reduction over the (padded) time axis -> batch-padding invariant
        x = nn.LayerNorm(name="norm")(x)
        x = nn.silu(x)
        return QDense(d, quant=cfg.quant_int8, name="pw2")(x)


class FeedForward(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = x.shape[-1]
        x = QDense(cfg.ff_expansion * d, quant=cfg.quant_int8, name="w1")(x)
        x = nn.silu(x)
        return QDense(d, quant=cfg.quant_int8, name="w2")(x)


class MoEFeedForward(nn.Module):
    """Mixture-of-experts feed-forward (dense-compute, top-k combine).

    Experts are stacked on a leading axis — ``w1 [E, d, f]``, ``w2
    [E, f, d]`` — so expert parallelism is a *sharding annotation*, not a
    dispatch system: ``parallel/mesh.py`` places the expert dim on the
    ``model`` axis and GSPMD turns the combine into one psum over ICI.
    Every expert computes every token; the top-k softmax gate zeroes the
    non-selected outputs in the combine weights. For n_experts ≈ mesh
    width this costs one dense FF pass per device and keeps serving
    latency deterministic (no capacity overflows, no all_to_all) — the
    TPU-first tradeoff for serving-scale expert counts (see
    presets.ModelConfig.moe_experts).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = x.shape[-1]
        e, f = cfg.moe_experts, cfg.ff_expansion * d
        k = min(cfg.moe_top_k, e)

        gate_w = self.param("gate", nn.initializers.lecun_normal(), (d, e))
        w1 = self.param("w1", nn.initializers.lecun_normal(), (e, d, f))
        b1 = self.param("b1", nn.initializers.zeros, (e, f))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (e, f, d))
        b2 = self.param("b2", nn.initializers.zeros, (e, d))

        # top-k gate: softmax over the selected experts only (renormalized
        # combine weights, Switch/GShard convention), dense [B, T, E] mask
        logits = jnp.dot(x, gate_w)                      # [B, T, E]
        top_vals, _ = jax.lax.top_k(logits, k)
        thresh = top_vals[..., -1:]                      # k-th largest
        selected = logits >= thresh                      # [B, T, E] bool
        masked = jnp.where(selected, logits,
                           jnp.asarray(-1e9, logits.dtype))
        combine = jax.nn.softmax(masked, axis=-1)        # zeros off-top-k

        # every expert computes (dense MoE); combine folds the gate in.
        # einsum keeps the expert dim explicit so GSPMD shards it.
        h = jnp.einsum("btd,edf->ebtf", x, w1) + b1[:, None, None, :]
        h = nn.silu(h)
        y = jnp.einsum("ebtf,efd->ebtd", h, w2) + b2[:, None, None, :]
        return jnp.einsum("ebtd,bte->btd", y, combine)


class ConformerBlock(nn.Module):
    config: ModelConfig

    def _gain(self, name: str, d: int):
        """LayerScale: learnable per-channel residual-branch gain
        (config.layerscale as init; identity when disabled). Deep stacks
        need it to escape the uniform-token saddle when training from
        scratch (see presets.ModelConfig.layerscale)."""
        ls = self.config.layerscale
        if ls <= 0.0:
            return None
        return self.param(name, nn.initializers.constant(ls), (d,))

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array) -> jax.Array:
        d = x.shape[-1]

        def add(x, branch, gname):
            g = self._gain(gname, d)
            return x + (branch if g is None else g * branch)

        x = add(x, 0.5 * FeedForward(self.config, name="ff1")(
            nn.LayerNorm(name="ln_ff1")(x)), "ls_ff1")
        x = add(x, MHSA(self.config, name="mhsa")(
            nn.LayerNorm(name="ln_mhsa")(x), pad_mask), "ls_mhsa")
        x = add(x, ConvModule(self.config, name="conv")(
            nn.LayerNorm(name="ln_conv")(x), pad_mask), "ls_conv")
        ff2_cls = (MoEFeedForward if self.config.moe_experts > 0
                   else FeedForward)
        x = add(x, 0.5 * ff2_cls(self.config, name="ff2")(
            nn.LayerNorm(name="ln_ff2")(x)), "ls_ff2")
        return nn.LayerNorm(name="ln_out")(x)


class Subsampler(nn.Module):
    """Stride-2 separable-conv stack: [B, T, n_mels] -> [B, T/k, d_model]."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        cfg = self.config
        n_stages = int(np.log2(cfg.subsampling_factor))
        ch = cfg.subsampling_dim
        lens = lengths
        pad = [(4, 0)] if cfg.causal else "SAME"
        for i in range(n_stages):
            x = nn.Conv(features=ch, kernel_size=(5,), strides=(2,),
                        padding=pad, name=f"conv{i}")(x)
            x = nn.silu(x)
            # re-mask each stage: conv bias + silu otherwise turn padding
            # into nonzero values that the next stage's windows read
            lens = (lens + 1) // 2
            mask = jnp.arange(x.shape[1])[None, :] < lens[:, None]
            x = jnp.where(mask[:, :, None], x, 0.0)
        return nn.Dense(cfg.d_model, name="proj")(x)


class ConformerEncoder(nn.Module):
    """[B, n_mels, T] + lengths -> [B, T', d_enc] + encoded lengths."""

    config: ModelConfig

    @nn.compact
    def __call__(self, features: jax.Array, lengths: jax.Array,
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        x = jnp.transpose(features, (0, 2, 1))  # [B, T, n_mels]
        x = Subsampler(cfg, name="subsampler")(x, lengths)
        t_sub = x.shape[1]
        # ceil-div lengths through the stride-2 stack ("SAME" padding)
        enc_lens = lengths
        for _ in range(int(np.log2(cfg.subsampling_factor))):
            enc_lens = (enc_lens + 1) // 2
        enc_lens = enc_lens.astype(jnp.int32)

        pad_mask = jnp.arange(t_sub)[None, :] < enc_lens[:, None]
        x = jnp.where(pad_mask[:, :, None], x, 0.0)

        block_cls = (nn.remat(ConformerBlock, static_argnums=())
                     if cfg.remat else ConformerBlock)
        for i in range(cfg.n_layers):
            x = block_cls(cfg, name=f"block{i}")(x, pad_mask)

        x = nn.Dense(cfg.d_enc, name="out_proj")(x)
        x = jnp.where(pad_mask[:, :, None], x, 0.0)
        return x, enc_lens
