"""Vocabulary parity tests (ref behavior: src/asr/types.rs:76-155)."""

from amira_rust_asr_server_tpu.vocab import Vocabulary


def test_load_and_len(vocab_path):
    v = Vocabulary.load(vocab_path)
    assert len(v) == 15
    assert v.get_token(5) == "▁the"
    assert v.get_id("▁the") == 5


def test_decode_bpe_joining(vocab_path):
    v = Vocabulary.load(vocab_path)
    # "▁the" + "re" -> "there"; leading space trimmed
    assert v.decode_tokens([5, 6]) == "there"
    # "▁th" "at" "▁i" "nd" -> "that ind"
    assert v.decode_tokens([2, 10, 14, 13]) == "that ind"


def test_decode_skips_unknown_ids(vocab_path):
    v = Vocabulary.load(vocab_path)
    assert v.decode_tokens([5, 9999, 6]) == "there"


def test_decode_empty():
    v = Vocabulary.from_map({})
    assert v.decode_tokens([1, 2, 3]) == ""
    assert not v


def test_load_skips_malformed_lines(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("good 1\nbadline\nalso bad x\nmulti word token 7\n")
    v = Vocabulary.load(str(p))
    assert v.get_token(1) == "good"
    # token may contain spaces; id is the last field (ref parser behavior)
    assert v.get_token(7) == "multi word token"
    assert len(v) == 2


def test_encode_text_roundtrip(vocab_path):
    v = Vocabulary.load(vocab_path)
    # "there" = ▁the + re (greedy longest match)
    ids = v.encode_text("there")
    assert ids == [5, 6]
    assert v.decode_tokens(ids) == "there"


def test_encode_unknown_chars(vocab_path):
    v = Vocabulary.load(vocab_path)
    ids = v.encode_text("zzz")
    # no pieces match; falls back to <unk>=0 per char (▁ prefix also unk)
    assert all(i == 0 for i in ids)


def test_encode_real_vocab_roundtrip():
    v = Vocabulary.load("/root/reference/model-repo/vocab.txt")
    text = "the quick brown fox jumps over the lazy dog"
    ids = v.encode_text(text)
    assert v.decode_tokens(ids) == text


def test_decode_words_grouping():
    import dataclasses
    from amira_rust_asr_server_tpu.types import TokenInfo
    v = Vocabulary.from_map({0: "▁the", 1: "▁qui", 2: "ck", 3: "▁fox"})
    details = [TokenInfo(0, 0.1, 0.9), TokenInfo(1, 0.3, 0.8),
               TokenInfo(2, 0.4, 0.6), TokenInfo(3, 0.7, 0.95)]
    words = v.decode_words(details)
    assert [w["word"] for w in words] == ["the", "quick", "fox"]
    assert words[1]["start_s"] == 0.3
    assert words[1]["end_s"] == 0.4
    assert words[1]["confidence"] == 0.6  # weakest piece
