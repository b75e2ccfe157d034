"""Core ASR domain types.

Parity source: reference ``src/asr/types.rs`` — ``DecoderState``,
``Transcription``, ``AccumulatedPredictions``, ``StreamStatus``,
``AsrResponse`` (camelCase wire schema, UPPERCASE status values).

The TPU twist: ``DecoderState`` is a pair of device arrays ([2, B, 640] x2,
the 2-layer LSTM hidden/cell of the prediction network) that normally lives
in HBM for the lifetime of a stream; it only materializes on host for
serialization/debugging.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import DECODER_STATE_SIZE


class StreamStatus(str, enum.Enum):
    """Streaming session status (ref: types.rs:234-249; serialized UPPERCASE)."""

    ACTIVE = "ACTIVE"
    COMPLETE = "COMPLETE"
    PAUSED = "PAUSED"
    ERROR = "ERROR"


@dataclasses.dataclass
class SeqSlice:
    """Half-open [start, end) slice of a sequence (ref: types.rs:24-74)."""

    start: int
    end: int

    def __len__(self) -> int:
        return max(0, self.end - self.start)

    def map(self, fn) -> "SeqSlice":
        return SeqSlice(fn(self.start), fn(self.end))


@jax.tree_util.register_pytree_node_class
class DecoderState:
    """RNN-T prediction-network recurrent state.

    Two tensors of shape [2, B, 640] (ref: types.rs:157-181 uses B=1;
    here B is the continuous-batching lane count). ``states_1`` is the LSTM
    hidden (h), ``states_2`` the cell (c), matching the decoder_joint
    contract's input_states_1/input_states_2.
    """

    def __init__(self, states_1: jax.Array, states_2: jax.Array):
        self.states_1 = states_1
        self.states_2 = states_2

    @classmethod
    def zeros(cls, batch: int = 1, size: int = DECODER_STATE_SIZE,
              dtype=jnp.float32) -> "DecoderState":
        shape = (2, batch, size)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def batch(self) -> int:
        return self.states_1.shape[1]

    def tree_flatten(self):
        return (self.states_1, self.states_2), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self) -> str:
        return f"DecoderState(shape={tuple(self.states_1.shape)})"


@dataclasses.dataclass
class TokenInfo:
    """Per-token detail: timing + confidence (the richer result surface
    the reference sketches but never wires, ref: src/asr/traits.rs:11-559)."""

    id: int
    time_s: float
    confidence: float


@dataclasses.dataclass
class Transcription:
    """Result of transcribing audio (ref: types.rs:214-232)."""

    text: str
    tokens: List[int]
    audio_length_samples: int
    features_length: int
    encoded_length: int
    token_details: Optional[List[TokenInfo]] = None
    n_best: Optional[List[Dict[str, Any]]] = None  # beam alternatives
    # which device program decoded this (beam: "pallas_kernel"|"xla_scan")
    # — surfaces the graph-size routing cliff (pipeline.py
    # PALLAS_GRAPH_MAX_STATES) so grammar users can diagnose latency
    decode_path: Optional[str] = None
    # beam decodes: total log-prob of the winning hypothesis
    score: Optional[float] = None


@dataclasses.dataclass
class AccumulatedPredictions:
    """Accumulated streaming state (ref: types.rs:183-212)."""

    transcript: str = ""
    token_ids: List[int] = dataclasses.field(default_factory=list)
    mean_amplitude: float = 0.0

    def clear(self) -> None:
        self.transcript = ""
        self.token_ids = []
        self.mean_amplitude = 0.0


@dataclasses.dataclass
class AsrResponse:
    """Wire response schema (ref: types.rs:252-272; camelCase keys).

    ``message``/``metadata``/``opaque`` are omitted from the payload when
    None, matching serde's skip_serializing_if behavior.
    """

    transcription: str
    status: StreamStatus
    message: Optional[str] = None
    metadata: Optional[Dict[str, Any]] = None
    opaque: Optional[Any] = None

    def to_json(self) -> Dict[str, Any]:
        payload: Dict[str, Any] = {
            "transcription": self.transcription,
            "status": self.status.value,
        }
        if self.message is not None:
            payload["message"] = self.message
        if self.metadata is not None:
            payload["metadata"] = self.metadata
        if self.opaque is not None:
            payload["opaque"] = self.opaque
        return payload


def as_numpy_tokens(tokens) -> List[int]:
    """Normalize device/np token arrays to a plain python int list."""
    if isinstance(tokens, (jnp.ndarray, np.ndarray)):
        return [int(t) for t in np.asarray(tokens).reshape(-1)]
    return [int(t) for t in tokens]
