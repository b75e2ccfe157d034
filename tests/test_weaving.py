"""Transcript weaving tests (ref behaviors: src/asr/weaving.rs)."""

import numpy as np

from amira_rust_asr_server_tpu.runtime.weaving import (align_score,
                                                       best_alignment,
                                                       is_overlap_silence,
                                                       levenshtein,
                                                       weave_transcript_segs,
                                                       word_distance)


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("same", "same") == 0


def test_levenshtein_unicode():
    assert levenshtein("café", "cafe") == 1
    assert levenshtein("▁the", "▁thee") == 1


def test_word_distance_normalization():
    assert word_distance("abc", "abc") == 0.0
    assert word_distance("", "") == 0.0
    d = word_distance("abcd", "abce")
    assert 0 < d < 0.5


def test_align_score_prefers_true_overlap():
    first = "the quick brown fox"
    second = "brown fox jumps over"
    # overlap of 9 chars ("brown fox") should beat a tiny overlap
    good = align_score(first, second, 9, 0.5)
    bad = align_score(first, second, 2, 0.5)
    assert good > bad


def test_best_alignment_finds_overlap():
    first = "hello world how are"
    second = "how are you today"
    overlap, score = best_alignment(first, second, 0.4)
    assert score > 0
    # found overlap should cover roughly "how are" (7 chars)
    assert 5 <= overlap <= 10


def test_weave_overlapping_transcripts():
    first = "the quick brown fox"
    second = "brown fox jumps over the lazy dog"
    woven = weave_transcript_segs(first, second, 0.5, 0.01)
    # the overlap region must not be duplicated
    assert woven.count("brown fox") == 1
    assert woven.startswith("the quick")
    assert woven.endswith("lazy dog")


def test_weave_no_alignment_concatenates():
    woven = weave_transcript_segs("abc def", "xyz uvw", 0.01, 0.9)
    assert woven == "abc def xyz uvw"


def test_weave_empty_segments():
    assert weave_transcript_segs("", "hello", 0.5, 0.01) == " hello"
    assert weave_transcript_segs("hello", "", 0.5, 0.01) == "hello "


def test_is_overlap_silence():
    loud = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
    quiet = loud * 1e-4
    assert is_overlap_silence(quiet, mean_amplitude=0.5)
    assert not is_overlap_silence(loud, mean_amplitude=0.5)
    assert is_overlap_silence(np.zeros(0, np.float32), 0.5)
