"""Word splitting (process_splits equivalent)."""

import numpy as np

from fots.codec import LabelCodec, SepLabelCodec
from fots.wordsplit import decode_with_splits, split_detection, split_line_box


def _codec():
    return LabelCodec(alphabet="abc .")


def _ids(codec, s):
    return np.asarray([codec._dict.get(c, 0) for c in s], np.int32)


def test_decode_with_splits_two_words():
    c = _codec()
    # frames: a a b _ ' ' _ c a
    frames = _ids(c, "aab") .tolist() + [0, c._dict[" "], 0] + _ids(c, "ca").tolist()
    text, words, split_frames, start, end = decode_with_splits(np.asarray(frames), c)
    assert words == ["ab", "ca"]
    assert len(split_frames) == 2
    assert split_frames[0] == 5  # frame just after the space


def test_decode_with_splits_punctuation_kept():
    c = _codec()
    frames = _ids(c, "ab.c").tolist()
    text, words, split_frames, *_ = decode_with_splits(np.asarray(frames), c)
    assert words == ["ab.", "c"]


def test_split_line_box_geometry():
    box = np.array([0, 0, 0, 10, 100, 10, 100, 0], np.float64)  # p0 tl, p1 bl...
    words = ["ab", "cd"]
    split_frames = np.asarray([10, 20])
    out = split_line_box(box, words, split_frames, start_frame=0, n_frames=20)
    assert len(out) == 2
    q0, w0 = out[0]
    q1, w1 = out[1]
    assert (w0, w1) == ("ab", "cd")
    # first word occupies the left part, second the right
    assert q0[:, 0].max() < q1[:, 0].max()
    assert q0[:, 0].min() <= 1.0
    assert q1[:, 0].max() <= 100.0 + 1e-6


def test_split_detection_single_word_returns_whole_box():
    c = _codec()
    box = np.array([0, 0, 0, 10, 100, 10, 100, 0, 0.9], np.float64)
    frames = _ids(c, "abc")
    out = split_detection(box, frames, c)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][0], box[:8].reshape(4, 2))
    assert out[0][1] == "abc"


def test_sep_codec_roundtrip():
    c = SepLabelCodec("foo bar baz", " ")
    ids, ln = c.encode("foo baz")
    assert ids.tolist() == [1, 3]
    assert c.decode_ids([1, 1, 0, 3]) == "foobaz"
    assert c.num_classes == 4
