"""CTC loss with the reference's exact reduction semantics.

The reference trains with `nn.CTCLoss(blank=0, reduction='mean',
zero_infinity=True)` (`trainer.py:24`), fed log-softmax outputs in (T, B, V)
(`trainer.py:53-61`). torch's 'mean' reduction divides each sequence's
negative log-likelihood by its *target length* and then averages over the
batch; `zero_infinity` zeroes non-finite losses (degenerate alignments where
T < target length).

`optax.ctc_loss` returns per-sequence NLL (it applies its own log-softmax,
which is idempotent on already-log-softmaxed inputs), so this wrapper adds
the length normalization + zero_infinity + batch mean. The TF stack's
`ctc_batch_cost` + count_nonzero label lengths (`train.py:468-490`) is
subsumed by the same wrapper via the `label_paddings` mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ctc_loss_mean(
    log_probs: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    input_lengths: jax.Array | None = None,
    blank_id: int = 0,
) -> jax.Array:
    """Mean CTC loss with torch 'mean' + zero_infinity semantics.

    Args:
      log_probs: (B, T, V) log-probabilities (batch-major, unlike torch's
        time-major call convention — the permute at `trainer.py:53` is an
        artifact of torch's API, not of the math).
      labels: (B, L) int labels, 0-padded (blank never appears in targets).
      label_lengths: (B,) true label lengths.
      input_lengths: (B,) valid input frames; defaults to full T
        (`trainer.py:56`: all sequences padded to the same length).

    Returns: scalar loss.
    """
    B, T, _ = log_probs.shape
    L = labels.shape[1]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, jnp.int32)

    t_idx = jnp.arange(T)[None, :]
    logit_paddings = (t_idx >= input_lengths[:, None]).astype(jnp.float32)
    l_idx = jnp.arange(L)[None, :]
    label_paddings = (l_idx >= label_lengths[:, None]).astype(jnp.float32)

    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, labels, label_paddings, blank_id=blank_id
    )  # (B,) negative log-likelihood

    # torch 'mean': divide by target length, then average over batch.
    norm = jnp.maximum(label_lengths.astype(per_seq.dtype), 1.0)
    per_seq = per_seq / norm

    # zero_infinity=True: torch yields +inf exactly when no valid alignment
    # exists, i.e. input_length < label_length + (#consecutive duplicate
    # label pairs), and zeroes it. optax instead returns a large finite value
    # (log_epsilon=-1e5 per impossible transition), so detect infeasibility
    # structurally and zero those sequences, plus any non-finite stragglers.
    valid_pair = (l_idx[:, 1:] < label_lengths[:, None]).astype(jnp.int32)
    dups = jnp.sum(
        (labels[:, 1:] == labels[:, :-1]).astype(jnp.int32) * valid_pair, axis=1
    )
    feasible = input_lengths >= (label_lengths + dups)
    per_seq = jnp.where(feasible & jnp.isfinite(per_seq), per_seq, 0.0)
    return jnp.mean(per_seq)
