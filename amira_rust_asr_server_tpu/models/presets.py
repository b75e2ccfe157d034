"""Model configuration presets.

The flagship ("large") preset realizes the reference's exact tensor
contract (ref: model-repo/*/config.pbtxt): 128 mels in, 1024-d encoder
output, 2-layer 640-d LSTM prediction net, 1030-way joint logits with
blank=1024. Smaller presets keep the same topology for tests/CI.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from ..constants import (BLANK_TOKEN_ID, DECODER_STATE_SIZE,
                         ENCODER_OUTPUT_SIZE, N_MELS, VOCABULARY_SIZE)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # encoder
    n_mels: int = N_MELS
    d_model: int = 1024
    n_layers: int = 17
    n_heads: int = 8
    ff_expansion: int = 4
    conv_kernel: int = 9
    subsampling_factor: int = 8  # must be a power of 2 (stride-2 stages)
    subsampling_dim: int = 256
    d_enc: int = ENCODER_OUTPUT_SIZE  # encoder output dim (contract: 1024)
    dropout: float = 0.1
    # limited attention context for streaming mode: (left, right) in frames,
    # (-1, -1) = full context
    att_context: Tuple[int, int] = (-1, -1)
    # causal mode: left-only conv padding + left-only attention — required
    # for the cache-based streaming encoder (ops/streaming.py) to be
    # exactly equivalent to the batch forward
    causal: bool = False
    # rematerialize each conformer block in the backward pass (training
    # memory for FLOPs trade; no effect on inference)
    remat: bool = False
    # LayerScale (learnable per-channel residual-branch gain, init to this
    # value; 0.0 = off). Deep conformer stacks (8+ blocks) plateau at the
    # uniform-token saddle on from-scratch training without it — small
    # initial branch gains keep the input's acoustic signal dominant early
    # so feature learning starts; shallow stacks don't need it. Off by
    # default so existing checkpoints load unchanged.
    layerscale: float = 0.0
    # serving-only: route encoder dense matmuls through the int8 MXU path
    # (W8A8 dynamic quant, ops/quant.py). Param pytree is unchanged;
    # checkpoints load as-is. Set via Config.quantization="int8".
    quant_int8: bool = False
    # Mixture-of-experts second feed-forward (0 = dense FF everywhere).
    # Dense-compute MoE: every expert runs, top-k combine by gate weight
    # — no all_to_all, no token dropping, deterministic serving latency;
    # the expert dim is sharded over the `model` mesh axis (expert
    # parallelism), so wall-clock per device is ~one FF pass when
    # n_experts ≈ mesh width. Capacity-routed all_to_all dispatch only
    # wins when n_experts >> devices, which serving meshes here never do.
    moe_experts: int = 0
    moe_top_k: int = 2

    # prediction network
    d_pred: int = DECODER_STATE_SIZE  # LSTM hidden (contract: 640)
    pred_layers: int = 2              # contract: states [2, B, 640]
    d_embed: int = DECODER_STATE_SIZE

    # joint
    d_joint: int = 640
    vocab_size: int = VOCABULARY_SIZE  # logit width (contract: 1030)
    blank_id: int = BLANK_TOKEN_ID

    def __post_init__(self):
        assert self.subsampling_factor & (self.subsampling_factor - 1) == 0, \
            "subsampling_factor must be a power of two"
        assert self.d_model % self.n_heads == 0


# Test-scale config: same topology, tiny dims, small vocab.
TINY = ModelConfig(
    n_mels=32, d_model=64, n_layers=2, n_heads=2, ff_expansion=2,
    conv_kernel=5, subsampling_factor=4, subsampling_dim=32, d_enc=64,
    d_pred=32, pred_layers=2, d_embed=32, d_joint=32,
    vocab_size=16, blank_id=15)

# Mid-size config for perf experiments. layerscale: 8-block stacks
# already plateau at the uniform-token saddle without it (measured:
# 2-layer escapes in ~150 steps, 8/17-layer never within 3000).
BASE = ModelConfig(d_model=512, n_layers=8, subsampling_dim=256, d_enc=1024,
                   layerscale=0.1)

# Flagship: reference-contract dims (conformer-XL-class encoder).
# layerscale=0.1 makes the 17-block stack trainable from scratch
# (without it the encoder never learns acoustics — loss pinned at
# ln(vocab); with it, full learning in <600 steps on the synth task).
LARGE = ModelConfig(layerscale=0.1)

# Causal variants for the native streaming mode (cache-based chunked
# encoder): left-only convs + bounded left attention context.
TINY_STREAMING = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
LARGE_STREAMING = dataclasses.replace(LARGE, causal=True,
                                      att_context=(128, 0))

PRESETS = {
    "tiny": TINY, "base": BASE, "large": LARGE,
    "tiny-streaming": TINY_STREAMING, "large-streaming": LARGE_STREAMING,
}


def get_preset(name: str) -> ModelConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown model preset {name!r}; have {list(PRESETS)}")
    return PRESETS[name]
