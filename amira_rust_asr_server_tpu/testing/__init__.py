"""Deterministic synthetic tasks for end-to-end/golden testing."""

from .digits import (DIGIT_WORDS, digits_vocab_map, digit_batches,
                     random_sentence, synth_digits, write_digits_vocab)
from .synthspeech import (random_token_ids, synth_token_ids,
                          synthspeech_batches, write_manifest)

__all__ = [
    "DIGIT_WORDS", "digits_vocab_map", "digit_batches", "random_sentence",
    "synth_digits", "write_digits_vocab",
    "random_token_ids", "synth_token_ids", "synthspeech_batches",
    "write_manifest",
]
