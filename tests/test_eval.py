"""Metric parity tests: CER/WER vs the reference DP, AUROC/accuracy vs sklearn."""

import numpy as np
import pytest
import jax.numpy as jnp
from sklearn.metrics import accuracy_score, roc_auc_score
from sklearn.metrics import roc_curve as sk_roc_curve

from avsync import eval as aeval


def _ref_cer(prediction, target):
    """Reference DP verbatim semantics (`train.py:945-967`)."""
    if len(target) == 0:
        return 1.0 if len(prediction) > 0 else 0.0
    m, n = len(prediction), len(target)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if prediction[i - 1] == target[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]) + 1
    return dp[m][n] / len(target)


class TestHostCerWer:
    CASES = [
        ("bin blue at f nine please", "bin blue at f nine please"),
        ("bin blue at f nine", "bin blue at f nine please"),
        ("lay red j two now", "lay red at j two now"),
        ("", "set green by b six"),
        ("something", ""),
        ("", ""),
        ("abcd", "dcba"),
    ]

    @pytest.mark.parametrize("pred,tgt", CASES)
    def test_cer_matches_reference(self, pred, tgt):
        assert aeval.calculate_cer(pred, tgt) == pytest.approx(_ref_cer(pred, tgt))

    @pytest.mark.parametrize("pred,tgt", CASES)
    def test_wer_matches_reference(self, pred, tgt):
        ref = _ref_cer(pred.split(), tgt.split()) if tgt.split() else (
            1.0 if pred.split() else 0.0
        )
        assert aeval.calculate_wer(pred, tgt) == pytest.approx(ref)


class TestBatchedLevenshtein:
    def test_random_batches_match_host(self):
        rng = np.random.default_rng(0)
        B, P, L = 6, 12, 10
        pred = rng.integers(1, 6, size=(B, P)).astype(np.int32)
        tgt = rng.integers(1, 6, size=(B, L)).astype(np.int32)
        pred_len = rng.integers(0, P + 1, size=(B,)).astype(np.int32)
        tgt_len = rng.integers(0, L + 1, size=(B,)).astype(np.int32)
        out = np.asarray(
            aeval.levenshtein_batch(
                jnp.asarray(pred), jnp.asarray(pred_len), jnp.asarray(tgt), jnp.asarray(tgt_len)
            )
        )
        for b in range(B):
            ref = aeval.edit_distance(
                list(pred[b, : pred_len[b]]), list(tgt[b, : tgt_len[b]])
            )
            assert out[b] == ref, (b, pred_len[b], tgt_len[b])

    def test_rates_with_empty_targets(self):
        pred = jnp.asarray([[1, 2], [1, 2], [0, 0]], jnp.int32)
        tgt = jnp.asarray([[1, 2], [0, 0], [0, 0]], jnp.int32)
        rates = np.asarray(
            aeval.cer_wer_batch(
                pred,
                jnp.asarray([2, 2, 0]),
                tgt,
                jnp.asarray([2, 0, 0]),
            )
        )
        np.testing.assert_allclose(rates, [0.0, 1.0, 0.0])


class TestAuroc:
    def test_matches_sklearn_no_ties(self):
        rng = np.random.default_rng(1)
        labels = rng.integers(0, 2, 50).astype(np.float32)
        scores = rng.random(50).astype(np.float32)
        ref = roc_auc_score(labels, scores)
        ours = float(aeval.auroc(jnp.asarray(labels), jnp.asarray(scores)))
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_matches_sklearn_with_ties(self):
        rng = np.random.default_rng(2)
        labels = rng.integers(0, 2, 80).astype(np.float32)
        scores = rng.integers(0, 5, 80).astype(np.float32) / 4.0
        ref = roc_auc_score(labels, scores)
        ours = float(aeval.auroc(jnp.asarray(labels), jnp.asarray(scores)))
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_single_class_is_nan(self):
        out = float(aeval.auroc(jnp.ones(4), jnp.asarray([0.1, 0.4, 0.2, 0.9])))
        assert np.isnan(out)

    def test_masked(self):
        labels = np.array([1, 0, 1, 0, 1], np.float32)
        scores = np.array([0.9, 0.1, 0.8, 0.95, 0.3], np.float32)
        mask = np.array([1, 1, 1, 0, 1], np.float32)
        ref = roc_auc_score(labels[mask > 0], scores[mask > 0])
        ours = float(
            aeval.auroc(jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(mask))
        )
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_accuracy_matches_sklearn(self):
        rng = np.random.default_rng(3)
        labels = rng.integers(0, 2, 30).astype(np.float32)
        probs = rng.random(30).astype(np.float32)
        ref = accuracy_score(labels, (probs > 0.5).astype(float))
        ours = float(aeval.binary_accuracy(jnp.asarray(labels), jnp.asarray(probs)))
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_roc_curve_matches_sklearn_auc(self):
        rng = np.random.default_rng(4)
        labels = rng.integers(0, 2, 40)
        scores = rng.random(40)
        fpr, tpr, _ = aeval.roc_curve(labels, scores)
        sk_fpr, sk_tpr, _ = sk_roc_curve(labels, scores, drop_intermediate=False)
        np.testing.assert_allclose(np.trapezoid(tpr, fpr), np.trapezoid(sk_tpr, sk_fpr), atol=1e-9)


class TestEvaluateTranscripts:
    def test_aggregate(self):
        preds = ["bin blue at f nine please", "lay red j two now"]
        tgts = ["bin blue at f nine please", "lay red at j two now"]
        out = aeval.evaluate_transcripts(preds, tgts)
        assert out["accuracy"] == 0.5
        assert out["num_samples"] == 2
        assert 0 < out["wer"] < 0.2
