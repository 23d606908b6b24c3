"""CTC beam search: agrees with greedy on easy cases, beats it on hard ones."""

import numpy as np

from fots.codec import LabelCodec
from fots.ops.ctc_decode import beam_decode_text, greedy_decode, prefix_beam_search


def _logp(probs):
    p = np.asarray(probs, np.float64)
    p = p / p.sum(-1, keepdims=True)
    return np.log(np.maximum(p, 1e-12))


def test_beam_matches_greedy_on_peaked():
    codec = LabelCodec(alphabet="ab")
    # clear sequence: a, blank, b
    lp = _logp([[0.05, 0.9, 0.05], [0.9, 0.05, 0.05], [0.05, 0.05, 0.9]])
    ids = greedy_decode(lp)
    greedy_text = codec.decode_ids(ids.tolist())
    beam_text = beam_decode_text(lp, codec)
    assert greedy_text == beam_text == "ab"


def test_beam_marginalizes_over_alignments():
    # classic case where greedy is suboptimal: the blank path wins framewise
    # but the summed non-blank paths win overall
    lp = _logp([[0.4, 0.6], [0.4, 0.6]])  # K=2: blank, 'a'
    # greedy: a a -> "a"; total P(a) = .6*.6 (aa) + .4*.6 + .6*.4 = .84
    beams = prefix_beam_search(lp, beam_width=4)
    best = beams[0][0]
    assert best == (1,)
    lp2 = _logp([[0.6, 0.4], [0.6, 0.4]])
    # P(empty)=.36, P(a)= .4*.4 + 2*.6*.4 = .64 -> beam should pick "a"
    beams2 = prefix_beam_search(lp2, beam_width=4)
    assert beams2[0][0] == (1,)


def test_beam_handles_repeats():
    codec = LabelCodec(alphabet="a")
    # a blank a => "aa"
    lp = _logp([[0.02, 0.98], [0.98, 0.02], [0.02, 0.98]])
    assert beam_decode_text(lp, codec) == "aa"
    # a a a (no blank) => "a"
    lp = _logp([[0.02, 0.98], [0.02, 0.98], [0.02, 0.98]])
    assert beam_decode_text(lp, codec) == "a"


def test_sparse_topk_beam_matches_dense():
    """prefix_beam_search_topk (the serving path's device-pruned variant)
    must equal the dense search when k covers the whole vocabulary."""
    from fots.ops.ctc_decode import prefix_beam_search_topk

    rng = np.random.default_rng(1)
    lp = np.log(rng.dirichlet(np.ones(12), size=15))
    dense = prefix_beam_search(lp, beam_width=5, top_k_per_frame=12)
    k = 12
    top_ids = np.argsort(-lp, axis=1)[:, :k]
    top_lp = np.take_along_axis(lp, top_ids, axis=1)
    sparse = prefix_beam_search_topk(top_ids, top_lp, lp[:, 0], beam_width=5)
    assert dense[0][0] == sparse[0][0]
    np.testing.assert_allclose(dense[0][1], sparse[0][1], rtol=1e-9)
    # pruned k: still returns a sane, sorted hypothesis list
    sparse8 = prefix_beam_search_topk(top_ids[:, :8], top_lp[:, :8],
                                      lp[:, 0], beam_width=5)
    scores = [s for _, s in sparse8]
    assert scores == sorted(scores, reverse=True)


def test_beam_scores_sorted_and_finite():
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(10), size=20))
    beams = prefix_beam_search(lp, beam_width=6)
    scores = [s for _, s in beams]
    assert scores == sorted(scores, reverse=True)
    assert all(np.isfinite(s) for s in scores)
