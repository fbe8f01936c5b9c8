"""Evaluation metrics: CER/WER (edit distance) and AUROC/ROC/accuracy.

Parity targets:
  * `calculate_cer`/`calculate_wer` (`train.py:945-993`): Levenshtein
    distance normalized by target length, with the empty-target convention
    (1.0 if the prediction is non-empty else 0.0).
  * sklearn `roc_auc_score`/`accuracy_score` as used at
    `misalignment_detection_train.py:274-279` — reimplemented as jittable
    rank statistics (Mann-Whitney with average ranks == trapezoidal AUROC).

Both a host path (strings, exact reference semantics) and a device path
(padded index tensors, `lax.scan` DP over one string dimension) are provided;
the device path batches over B on the other.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host-side edit distance (exact reference semantics)
# ---------------------------------------------------------------------------

def edit_distance(a: Sequence, b: Sequence) -> int:
    """Classic O(len(a)*len(b)) Levenshtein, two-row DP."""
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ai = a[i - 1]
        for j in range(1, n + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def calculate_cer(prediction: str, target: str) -> float:
    """Character error rate (`train.py:945-967`)."""
    if len(target) == 0:
        return 1.0 if len(prediction) > 0 else 0.0
    return edit_distance(prediction, target) / len(target)


def calculate_wer(prediction: str, target: str) -> float:
    """Word error rate (`train.py:970-993`)."""
    pred_words = prediction.split()
    target_words = target.split()
    if len(target_words) == 0:
        return 1.0 if len(pred_words) > 0 else 0.0
    return edit_distance(pred_words, target_words) / len(target_words)


# ---------------------------------------------------------------------------
# Device-side batched edit distance
# ---------------------------------------------------------------------------

def levenshtein_batch(
    pred: jax.Array,
    pred_len: jax.Array,
    tgt: jax.Array,
    tgt_len: jax.Array,
) -> jax.Array:
    """Batched Levenshtein over padded int sequences.

    pred: (B, P), tgt: (B, L), lengths (B,). Returns (B,) int32 distances.
    DP scans over pred positions carrying the (B, L+1) row — each scan step
    is vectorized over both batch and target dimensions.
    """
    B, P = pred.shape
    L = tgt.shape[1]

    # Row 0: distance from empty prediction = min(j, tgt_len)
    j = jnp.arange(L + 1)[None, :]
    row0 = jnp.minimum(j, tgt_len[:, None]).astype(jnp.int32)  # (B, L+1)

    def step(row, inp):
        p_t, i = inp  # p_t: (B,) current pred symbol; i: scalar step (1-based)
        sub_cost = jnp.where(tgt == p_t[:, None], 0, 1)  # (B, L)
        new_first = jnp.full((B,), i, jnp.int32)

        def inner(left, jj):
            val = jnp.minimum(
                jnp.minimum(row[:, jj + 1] + 1, left + 1),
                row[:, jj] + sub_cost[:, jj],
            )
            return val, val

        _, cols = jax.lax.scan(inner, new_first, jnp.arange(L))
        new_row = jnp.concatenate([new_first[:, None], cols.T], axis=1)
        # Positions past pred_len are padding: keep the previous row there.
        active = i <= pred_len  # (B,)
        return jnp.where(active[:, None], new_row, row), None

    final_row, _ = jax.lax.scan(step, row0, (pred.T, jnp.arange(1, P + 1)))
    return jnp.take_along_axis(final_row, tgt_len[:, None], axis=1)[:, 0]


def cer_wer_batch(
    pred: jax.Array, pred_len: jax.Array, tgt: jax.Array, tgt_len: jax.Array
) -> jax.Array:
    """Normalized edit-distance rates for index sequences (characters for CER
    when inputs are char ids, words for WER when inputs are word ids)."""
    d = levenshtein_batch(pred, pred_len, tgt, tgt_len).astype(jnp.float32)
    empty_tgt = tgt_len == 0
    rate = d / jnp.maximum(tgt_len.astype(jnp.float32), 1.0)
    return jnp.where(empty_tgt, (pred_len > 0).astype(jnp.float32), rate)


# ---------------------------------------------------------------------------
# AUROC / ROC / accuracy
# ---------------------------------------------------------------------------

def auroc(labels: jax.Array, scores: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Trapezoidal ROC-AUC via the Mann-Whitney statistic with average ranks
    (tie-correct, identical to sklearn.roc_auc_score). Returns NaN when one
    class is absent, matching the reference's NaN-guard
    (`misalignment_detection_train.py:276-279`)."""
    labels = labels.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(labels)
    mask = mask.astype(jnp.float32)

    # Average ranks (1-based) among all masked entries: push masked-out
    # entries to +inf so they occupy the top ranks and subtract nothing from
    # the positive-rank sum (their mask zeroes them out of every sum).
    s = jnp.where(mask > 0, scores, jnp.inf)
    order = jnp.argsort(s)
    sorted_s = s[order]
    n = scores.shape[0]
    left = jnp.searchsorted(sorted_s, s, side="left")
    right = jnp.searchsorted(sorted_s, s, side="right")
    ranks = (left + right + 1).astype(jnp.float32) / 2.0  # average 1-based
    del order, n

    n_pos = jnp.sum(labels * mask)
    n_neg = jnp.sum((1.0 - labels) * mask)
    rank_sum_pos = jnp.sum(ranks * labels * mask)
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    auc = u / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def binary_accuracy(
    labels: jax.Array,
    scores: jax.Array,
    threshold: float = 0.5,
    mask: jax.Array | None = None,
) -> jax.Array:
    """accuracy_score(labels, probs > 0.5) (`misalignment_detection_train.py:274-275`)."""
    if mask is None:
        mask = jnp.ones_like(scores)
    mask = mask.astype(jnp.float32)
    preds = (scores > threshold).astype(jnp.float32)
    correct = (preds == labels.astype(jnp.float32)).astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def roc_curve(
    labels: np.ndarray, scores: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side ROC points (fpr, tpr, thresholds) for plotting
    (`misalignment_detection_train.py:283-296`). Thresholds are the distinct
    scores in decreasing order, sklearn-style (without the +inf sentinel)."""
    labels = np.asarray(labels).astype(np.float64)
    scores = np.asarray(scores).astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    labels, scores = labels[order], scores[order]
    distinct = np.r_[np.where(np.diff(scores))[0], len(scores) - 1]
    tps = np.cumsum(labels)[distinct]
    fps = (distinct + 1) - tps
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    tpr = tps / max(n_pos, 1)
    fpr = fps / max(n_neg, 1)
    return (
        np.r_[0.0, fpr],
        np.r_[0.0, tpr],
        np.r_[scores[distinct][0] + 1.0, scores[distinct]],
    )


def evaluate_transcripts(
    predictions: List[str], targets: List[str]
) -> dict:
    """Aggregate CER/WER/exact-match over decoded transcripts, as the TF
    stack's test() reports (`train.py:916-942`)."""
    cers = [calculate_cer(p, t) for p, t in zip(predictions, targets)]
    wers = [calculate_wer(p, t) for p, t in zip(predictions, targets)]
    exact = [p == t for p, t in zip(predictions, targets)]
    n = max(len(predictions), 1)
    return {
        "cer": float(np.mean(cers)) if cers else 0.0,
        "wer": float(np.mean(wers)) if wers else 0.0,
        "accuracy": float(np.sum(exact)) / n,
        "num_samples": len(predictions),
    }
