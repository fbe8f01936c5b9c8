"""CTC prefix beam-search tests: exactness vs brute force, greedy comparison."""

import itertools

import numpy as np
import pytest

from avsync import text
from avsync.ops.beam import ctc_beam_search


def brute_force_best(log_probs, blank_id=0):
    """Enumerate ALL alignment paths, sum per collapsed label, argmax."""
    T, V = log_probs.shape
    totals = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(log_probs[t, s] for t, s in enumerate(path))
        # collapse
        out, prev = [], blank_id
        for s in path:
            if s != prev and s != blank_id:
                out.append(s)
            prev = s
        key = tuple(out)
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    return max(totals.items(), key=lambda kv: kv[1])


class TestBeamExactness:
    @pytest.mark.parametrize("seed", range(4))
    def test_wide_beam_matches_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        T, V = 5, 4
        logits = rng.normal(size=(T, V))
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        best_bf, score_bf = brute_force_best(lp)
        best_bs, score_bs = ctc_beam_search(lp, beam_width=64)
        assert best_bs == best_bf
        assert score_bs == pytest.approx(score_bf, abs=1e-9)

    def test_wide_beam_never_worse_than_greedy(self):
        """With a beam wide enough to avoid pruning at these sizes, the
        beam's best prefix scores >= the greedy labeling's true CTC
        probability (narrow beams can in principle prune the optimum)."""
        rng = np.random.default_rng(7)
        for _ in range(10):
            T, V = 6, 5
            logits = rng.normal(size=(T, V)) * 2
            lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            greedy = lp.argmax(-1)
            out, prev = [], 0
            for s in greedy:
                if s != prev and s != 0:
                    out.append(int(s))
                prev = s
            _, beam_score = ctc_beam_search(lp, beam_width=256)
            assert beam_score + 1e-9 >= _prefix_prob(lp, tuple(out))


def _prefix_prob(lp, prefix, blank_id=0):
    """Exact CTC log-prob of one labeling via forward algorithm."""
    T = lp.shape[0]
    L = len(prefix)
    ext = [blank_id]
    for s in prefix:
        ext += [s, blank_id]
    S = len(ext)
    alpha = np.full(S, -np.inf)
    alpha[0] = lp[0, ext[0]]
    if S > 1:
        alpha[1] = lp[0, ext[1]]
    for t in range(1, T):
        new = np.full(S, -np.inf)
        for s in range(S):
            a = alpha[s]
            if s >= 1:
                a = np.logaddexp(a, alpha[s - 1])
            if s >= 2 and ext[s] != blank_id and ext[s] != ext[s - 2]:
                a = np.logaddexp(a, alpha[s - 2])
            new[s] = a + lp[t, ext[s]]
        alpha = new
    return np.logaddexp(alpha[-1], alpha[-2]) if S > 1 else alpha[-1]


class TestBatchAndTextIntegration:
    def test_decode_batch_beam_option(self):
        rng = np.random.default_rng(3)
        lp = rng.normal(size=(2, 10, 39)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        greedy = text.decode_batch(lp)
        beam = text.decode_batch(lp, beam_width=8)
        assert len(beam) == 2
        for s in beam:
            assert isinstance(s, str)
        # on peaked distributions the two must agree
        peaked = np.full((1, 6, 39), -20.0, np.float32)
        for t, s in enumerate([2, 2, 0, 5, 0, 9]):
            peaked[0, t, s] = 0.0
        assert text.decode_batch(peaked) == text.decode_batch(peaked, beam_width=4)


class TestTfBeam:
    def test_tf_decode_beam_blank_last(self):
        rng = np.random.default_rng(11)
        lp = rng.normal(size=(1, 8, 32)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        out = text.tf_decode_batch(lp, beam_width=8)
        assert len(out) == 1 and isinstance(out[0], str)
        peaked = np.full((1, 5, 32), -20.0, np.float32)
        for t, s in enumerate([1, 31, 2, 31, 3]):  # 'a' blank 'b' blank 'c'
            peaked[0, t, s] = 0.0
        assert text.tf_decode_batch(peaked, beam_width=4) == ["abc"]
        assert text.tf_decode_batch(peaked) == ["abc"]
