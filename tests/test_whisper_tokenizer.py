"""Whisper tokenizer: byte-level BPE from local assets, special-token
layout derivation, timestamp parsing."""

import json

import pytest

from video_llava_tpu.audio.tokenizer import (
    WhisperTokenizer,
    parse_timestamp_segments,
    _bytes_to_unicode,
)


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    """Tiny GPT-2-style vocab: bytes for 'hello world' + merges that
    build 'hello'/'world' up from pairs, plus whisper specials."""
    d = tmp_path_factory.mktemp("whisper_tok")
    b2u = _bytes_to_unicode()
    base_tokens = sorted({b2u[b] for b in " helowrd!".encode("utf-8")})
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
        ("Ġ", "w"),  # space+w
        ("Ġw", "orld"),
    ]
    vocab = {}
    for tok in base_tokens:
        vocab[tok] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    n_text = len(vocab)
    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|de|>",
        "<|translate|>", "<|transcribe|>", "<|nospeech|>",
        "<|notimestamps|>",
    ]
    for s in specials:
        vocab[s] = len(vocab)
    # timestamp tokens occupy ids after <|notimestamps|>
    for i in range(0, 10):
        vocab[f"<|{i * 0.02:.2f}|>"] = len(vocab)

    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d), vocab, n_text


def test_special_layout(asset_dir):
    d, vocab, _ = asset_dir
    tok = WhisperTokenizer(d)
    assert tok.eot == vocab["<|endoftext|>"]
    assert tok.sot == vocab["<|startoftranscript|>"]
    assert tok.no_timestamps == vocab["<|notimestamps|>"]
    assert tok.timestamp_begin == vocab["<|notimestamps|>"] + 1
    assert tok.language_ids["en"] == vocab["<|en|>"]
    assert tok.sot_sequence("en", timestamps=False) == (
        tok.sot, vocab["<|en|>"], vocab["<|transcribe|>"],
        tok.no_timestamps,
    )
    assert tok.no_timestamps not in tok.sot_sequence(timestamps=True)


def test_bpe_round_trip(asset_dir):
    d, _, _ = asset_dir
    tok = WhisperTokenizer(d)
    for text in ["hello world", "hello", " world", "hello hello world"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    # merged tokens actually fire (not char-by-char)
    assert len(tok.encode("hello")) == 1
    assert len(tok.encode("hello world")) == 3  # hello, Ġ, world


def test_decode_skips_specials_and_timestamps(asset_dir):
    d, vocab, _ = asset_dir
    tok = WhisperTokenizer(d)
    ids = (
        list(tok.sot_sequence("en", timestamps=True))
        + [tok.timestamp_begin + 0]
        + tok.encode("hello")
        + [tok.timestamp_begin + 5, tok.eot]
    )
    assert tok.decode(ids) == "hello"
    with_ts = tok.decode_with_timestamps(ids)
    assert "<|0.00|>" in with_ts and "<|0.10|>" in with_ts


def test_parse_timestamp_segments():
    TB = 1000
    # [<|0.00|>] 7 8 [<|1.00|>] [<|1.50|>] 9 [<|2.00|>]
    ids = [TB, 7, 8, TB + 50, TB + 75, 9, TB + 100, 999]
    spans = parse_timestamp_segments(ids, TB, eot=999)
    assert len(spans) == 2
    assert spans[0].start == 0.0 and spans[0].end == 1.0
    assert spans[0].token_ids == [7, 8]
    assert spans[1].start == 1.5 and spans[1].end == 2.0
    assert spans[1].token_ids == [9]


def test_parse_timestamp_offset_and_unpaired():
    TB = 1000
    # text with no timestamps at all -> one span starting at 0
    spans = parse_timestamp_segments([5, 6], TB, offset=30.0)
    assert len(spans) == 1
    assert spans[0].start == 30.0 and spans[0].token_ids == [5, 6]
    # trailing unclosed segment keeps its start
    spans = parse_timestamp_segments([TB + 10, 5], TB)
    assert len(spans) == 1 and spans[0].start == pytest.approx(0.2)
