# TPU ASR server image (deploy parity with the reference's multi-stage,
# non-root, healthchecked Dockerfile — adapted for a TPU VM host where the
# accelerator arrives via the host's libtpu, not a bundled CUDA stack).
FROM python:3.12-slim AS builder

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /build
COPY csrc/ csrc/
RUN make -C csrc

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    curl && rm -rf /var/lib/apt/lists/* \
    && useradd --create-home --uid 10001 asr

WORKDIR /app
COPY --chown=asr amira_rust_asr_server_tpu/ amira_rust_asr_server_tpu/
COPY --chown=asr configs/ configs/
COPY --chown=asr --from=builder /build/csrc/libasr_audio.so csrc/libasr_audio.so
COPY --chown=asr csrc/audio_kernels.cc csrc/Makefile csrc/

# jax[tpu] is expected from the base environment of the TPU VM image in
# production; for standalone use: pip install "jax[tpu]" aiohttp pyyaml \
#   flax optax orbax-checkpoint prometheus_client
ENV PYTHONPATH=/app \
    ASR_LOG=INFO

USER asr
EXPOSE 8057

HEALTHCHECK --interval=30s --timeout=5s --start-period=300s --retries=3 \
  CMD curl -fs http://localhost:8057/health || exit 1

ENTRYPOINT ["python", "-m", "amira_rust_asr_server_tpu.server"]
