"""Label codecs: text <-> integer-id conversion for CTC training/decoding.

Reference behavior being reproduced (re-implemented, not ported):
- ``strLabelConverter`` (reference src/utils.py:30-109): chars map to
  ``1..N`` with CTC blank at 0; decode collapses repeats then removes blanks.
- the 4-offset multilingual codec convention used by the crop generator and
  ``print_seq_ext`` (reference tools/ocr_gen.py:26-32,
  tools/ocr_test_utils.py / tools/ocr_utils.py:15-62): real characters start
  at id 4; ids 0-3 are reserved (blank / control); unknown chars map to 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

# The 86-character ICDAR2015 charset (character data identical to the
# reference's data/alphabet.txt; it is dataset vocabulary, not code).
ICDAR15_ALPHABET = (
    "7BCNTh2!F'P0ouRvz3[Qdesr6#:ÉyU(4bt%\"?´Kl.ZOM8@A1+)/ ki&DW$fwn;=p5HqSjV]JX-GEagxILmYc9,"
)


@dataclass
class LabelCodec:
    """char <-> id codec with CTC blank at index 0.

    ids: blank = 0, alphabet[i] = i + 1.  ``num_classes`` = len(alphabet) + 1,
    matching the reference's ``nclass = len(alphabet) + 1`` (train.py:33).
    """

    alphabet: str = ICDAR15_ALPHABET
    ignore_case: bool = False
    _dict: Dict[str, int] = field(init=False, repr=False)
    _codes: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        if self.ignore_case:
            self.alphabet = self.alphabet.lower()
        self._dict = {ch: i + 1 for i, ch in enumerate(self.alphabet)}
        # unicode codepoints of the alphabet, for vectorized decode_batch
        self._codes = np.array([ord(c) for c in self.alphabet] or [0], np.uint32)

    @property
    def num_classes(self) -> int:
        return len(self.alphabet) + 1

    #: ids below this are blank/control, not characters (used by the
    #: serving confidence mean — reference tools/eval.py:646 `labels > 3`
    #: under the 4-offset codec; here only blank=0 is reserved)
    reserved_ids: int = 1

    def encode(self, texts: Sequence[str] | str) -> Tuple[np.ndarray, np.ndarray]:
        """Encode text(s) to a flat id array + per-text lengths.

        Mirrors strLabelConverter.encode (src/utils.py:52-72): returns the
        concatenation of all label sequences and the per-item lengths.
        Characters outside the alphabet are dropped (the reference would
        KeyError; dropping is the deliberate, robust behavior here).
        """
        if isinstance(texts, str):
            texts = [texts]
        ids: List[int] = []
        lengths: List[int] = []
        for t in texts:
            if self.ignore_case:
                t = t.lower()
            enc = [self._dict[c] for c in t if c in self._dict]
            ids.extend(enc)
            lengths.append(len(enc))
        return np.asarray(ids, dtype=np.int32), np.asarray(lengths, dtype=np.int32)

    def encode_padded(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode to a fixed-shape ``[N, max_len]`` id matrix + lengths.

        The padded layout is what the XLA CTC loss consumes (static shapes);
        the flat layout of :meth:`encode` is the reference-compatible form.
        """
        out = np.zeros((len(texts), max_len), dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, t in enumerate(texts):
            flat, ln = self.encode(t)
            n = min(int(ln[0]), max_len)
            out[i, :n] = flat[:n]
            lengths[i] = n
        return out, lengths

    def decode_ids(self, ids: Sequence[int], raw: bool = False) -> str:
        """CTC-collapse decode of one id sequence.

        Mirrors strLabelConverter.decode (src/utils.py:87-97): drop blanks
        (0) and repeated ids, map ``i -> alphabet[i-1]``.
        """
        if raw:
            return "".join(self.alphabet[i - 1] for i in ids if 0 < i <= len(self.alphabet))
        chars = []
        prev = 0
        for i in ids:
            if i != 0 and i != prev and 0 < i <= len(self.alphabet):
                chars.append(self.alphabet[i - 1])
            prev = i
        return "".join(chars)

    def decode_batch(self, ids: np.ndarray, lengths: np.ndarray | None = None) -> List[str]:
        """Decode a ``[N, T]`` id matrix (greedy CTC output) to strings.

        Vectorized CTC collapse: the keep mask (non-blank, differs from the
        raw previous id, in-alphabet) is computed for the whole matrix at
        once; identical output to per-row :meth:`decode_ids`.
        """
        ids = np.asarray(ids)
        if ids.size == 0:
            return [""] * ids.shape[0] if ids.ndim == 2 else []
        N, T = ids.shape
        valid = np.ones((N, T), bool)
        if lengths is not None:
            valid = np.arange(T)[None, :] < np.asarray(lengths).reshape(N, 1)
        prev = np.concatenate([np.zeros((N, 1), ids.dtype), ids[:, :-1]], axis=1)
        keep = valid & (ids != prev) & (ids > 0) & (ids <= len(self.alphabet))
        if not self.alphabet:
            return [""] * N
        # fully vectorized char materialization: gather codepoints, decode
        # ONE utf-32 buffer, slice per row (a per-row join of numpy U1
        # scalars costs ~140us/row — 45 ms per 320-roi batch, all host)
        codes = self._codes[np.clip(ids - 1, 0, len(self.alphabet) - 1)]
        flat = np.ascontiguousarray(codes[keep], dtype="<u4")
        s = flat.tobytes().decode("utf-32-le")
        offs = np.zeros(N + 1, np.int64)
        np.cumsum(keep.sum(axis=1), out=offs[1:])
        return [s[offs[i]:offs[i + 1]] for i in range(N)]


@dataclass
class Codec4:
    """Multilingual codec with 4 reserved ids (reference tools/ocr_gen.py:26-32).

    Real characters start at id 4; id 3 is the 'unknown' id; 0 is the CTC
    blank.  Used by the recognition-only (crop) training path and the
    ``print_seq_ext`` decoding convention.
    """

    charset: str
    _dict: Dict[str, int] = field(init=False, repr=False)

    def __post_init__(self):
        self._dict = {ch: i + 4 for i, ch in enumerate(self.charset)}

    @property
    def num_classes(self) -> int:
        return len(self.charset) + 4

    #: ids 0-3 are reserved (blank/control/unknown) — reference eval.py:646
    reserved_ids: int = 4

    def encode(self, text: str) -> List[int]:
        return [self._dict.get(c, 3) for c in text]

    def decode_with_splits(self, frame_ids: np.ndarray):
        """Greedy decode with word-split tracking.

        Re-implements the observable behavior of ``print_seq_ext``
        (reference tools/ocr_utils.py:15-62): collapse repeats; chars are
        ids >= 4; space/.,: end the current word and record the frame
        position of the split; ids 1..3 act as separators.

        Returns ``(text, (start,end), split_positions, words)``.
        """
        prev = 0
        word = ""
        current_word = ""
        start_pos = 0
        end_pos = 0
        dec_splits: List[int] = []
        splits: List[str] = []
        has_letter = False
        for cx in range(frame_ids.shape[0]):
            c = int(frame_ids[cx])
            if prev == c:
                if c > 2:
                    end_pos = cx
                continue
            if 3 < c < (len(self.charset) + 4):
                char = self.charset[c - 4]
                if char in (" ", ".", ",", ":"):
                    if has_letter:
                        if char != " ":
                            current_word += char
                        splits.append(current_word)
                        dec_splits.append(cx + 1)
                        word += char
                        current_word = ""
                else:
                    has_letter = True
                    word += char
                    current_word += char
                end_pos = cx
            elif c > 0:
                if has_letter:
                    dec_splits.append(cx + 1)
                    word += " "
                    end_pos = cx
                    splits.append(current_word)
                    current_word = ""
            if len(word) == 0:
                start_pos = cx
            prev = c
        dec_splits.append(end_pos + 1)
        return word.strip(), (start_pos, end_pos + 1), np.asarray(dec_splits), splits


@dataclass
class SepLabelCodec:
    """Separator-delimited token codec (multi-char 'alphabet' entries).

    Equivalent of ``strLabelConverterForCTC`` (reference src/utils.py:113-189):
    the alphabet is a sep-joined list of tokens; blank stays at 0 and
    tokens map to 1..N.
    """

    alphabet_str: str
    sep: str
    tokens: List[str] = field(init=False, repr=False)
    _dict: Dict[str, int] = field(init=False, repr=False)

    def __post_init__(self):
        self.tokens = self.alphabet_str.split(self.sep)
        self._dict = {t: i + 1 for i, t in enumerate(self.tokens)}

    @property
    def num_classes(self) -> int:
        return len(self.tokens) + 1

    def encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        toks = [self._dict[t] for t in text.split(self.sep) if t in self._dict]
        return np.asarray(toks, np.int32), np.asarray([len(toks)], np.int32)

    def decode_ids(self, ids: Sequence[int], raw: bool = False) -> str:
        if raw:
            return "".join(self.tokens[i - 1] for i in ids
                           if 0 < i <= len(self.tokens))
        out, prev = [], 0
        for i in ids:
            if i != 0 and i != prev and 0 < i <= len(self.tokens):
                out.append(self.tokens[i - 1])
            prev = i
        return "".join(out)


def load_charset(path: str) -> str:
    """Load a one-line charset file (e.g. a codec.txt-style vocabulary)."""
    with open(path, "r", encoding="utf-8") as f:
        return f.readlines()[0].rstrip("\n")


def build_charset_from_labels(labels) -> str:
    """Derive a charset from training transcriptions (sorted, deduped)."""
    chars = set()
    for t in labels:
        chars.update(t)
    return "".join(sorted(chars))


def levenshtein(a: str, b: str) -> int:
    """Edit distance (replaces the reference's `editdistance` dependency)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
