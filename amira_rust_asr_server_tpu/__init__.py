"""amira_rust_asr_server_tpu — a TPU-native streaming ASR framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
``AmiraLearning/amira-rust-asr-server`` (reference mounted read-only at
``/root/reference``): RNN-T (transducer) speech recognition served over
HTTP + WebSocket with batch transcription, incremental streaming partials,
greedy and beam decoding, layered configuration and full observability.

Where the reference delegates three neural nets (preprocessor / encoder /
decoder_joint) to a Triton server over gRPC — one round-trip per emitted
symbol — this framework runs log-mel feature extraction, the conformer
encoder and the full autoregressive RNN-T decode loop as one resident
on-device XLA program per chip, with per-stream decoder state held in HBM
across WebSocket chunks and concurrent streams continuously batched.

Layout (mirrors SURVEY.md §7):

- ``constants``    — domain constants (ref: src/constants.rs)
- ``config``       — layered TOML/YAML/env config (ref: src/config.rs)
- ``errors``       — error hierarchy (ref: src/error.rs)
- ``vocab``        — vocab.txt loading + BPE detokenization (ref: src/asr/types.rs:76-155)
- ``audio``        — PCM conversion, ring buffer, overlapping windows (ref: src/asr/audio.rs)
- ``models``       — preprocessor / conformer encoder / prediction-net + joint
- ``ops``          — STFT/mel, greedy + beam RNN-T decode, RNN-T loss, Pallas kernels
- ``parallel``     — device mesh, sharding rules, pjit wrappers
- ``runtime``      — inference engine, continuous batcher, stream state slots
- ``server``       — HTTP/WS front-end with the reference's exact public surface
- ``reliability``  — circuit breaker, graceful shutdown, metrics, tracing
"""

__version__ = "0.1.0"
