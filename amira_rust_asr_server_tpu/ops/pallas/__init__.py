"""Pallas TPU kernels for the hot ops."""

from .mel_kernel import log_mel_pallas

__all__ = ["log_mel_pallas"]
