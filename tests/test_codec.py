"""Codec behavior parity (strLabelConverter / print_seq_ext semantics)."""

import os

import numpy as np
import pytest

from fots.codec import (
    ICDAR15_ALPHABET,
    Codec4,
    LabelCodec,
    build_charset_from_labels,
    levenshtein,
)

REF_ALPHABET = "/root/reference/data/alphabet.txt"


def test_alphabet_matches_reference_file():
    if not os.path.exists(REF_ALPHABET):
        pytest.skip("reference not mounted")
    with open(REF_ALPHABET) as f:
        want = f.readlines()[0]
    assert ICDAR15_ALPHABET == want
    assert len(ICDAR15_ALPHABET) == 86


def test_encode_decode_roundtrip():
    c = LabelCodec()
    ids, lens = c.encode(["HELLO", "Kl."])
    assert lens.tolist() == [5, 3]
    assert ids.shape == (8,)
    # ids are 1-based into alphabet
    assert all(i >= 1 for i in ids)
    assert c.decode_ids(list(ids[:5])) in ("HELO", "HELLO")  # CTC collapse of LL


def test_ctc_collapse_semantics():
    c = LabelCodec(alphabet="ab")
    # blank=0, a=1, b=2; "aa b" style sequences
    assert c.decode_ids([1, 1, 0, 1, 2, 2]) == "aab"
    assert c.decode_ids([0, 0, 0]) == ""
    assert c.decode_ids([1, 0, 1, 0, 1]) == "aaa"
    raw = c.decode_ids([1, 1, 0, 2], raw=True)
    assert raw == "aab"


def test_encode_padded_static_shape():
    c = LabelCodec()
    mat, lens = c.encode_padded(["HELLO", "Kl."], max_len=10)
    assert mat.shape == (2, 10)
    assert lens.tolist() == [5, 3]
    assert (mat[0, 5:] == 0).all()


def test_num_classes_matches_reference_convention():
    c = LabelCodec()
    assert c.num_classes == 87  # len(alphabet)+1 (reference train.py:33)


def test_codec4_print_seq_ext_semantics():
    c4 = Codec4(charset="abc .")
    # ids: a=4 b=5 c=6 ' '=7 .=8
    frames = np.array([0, 4, 4, 0, 5, 7, 6, 0])
    word, (s, e), dec_splits, splits = c4.decode_with_splits(frames)
    assert word == "ab c"
    assert splits == ["ab"]
    assert dec_splits[-1] == e


def test_build_charset_and_levenshtein():
    cs = build_charset_from_labels(["abc", "bcd"])
    assert cs == "abcd"
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0


def test_decode_batch_matches_decode_ids(rng):
    """Vectorized decode_batch == per-row decode_ids on random id matrices,
    with and without explicit lengths."""
    from fots.codec import LabelCodec

    codec = LabelCodec()
    n_cls = codec.num_classes
    ids = rng.integers(0, n_cls + 3, (20, 17))  # includes out-of-range ids
    lengths = rng.integers(0, 18, 20)
    got = codec.decode_batch(ids)
    want = [codec.decode_ids(row.tolist()) for row in ids]
    assert got == want
    got_l = codec.decode_batch(ids, lengths)
    want_l = [codec.decode_ids(row[:int(l)].tolist()) for row, l in zip(ids, lengths)]
    assert got_l == want_l
