"""Vocabulary, alignment-file parsing, and CTC greedy decoding.

Reproduces the reference PyTorch stack's text semantics:
  * 37-character GRID charset with blank=0 and <pad>=38 (`dataset.py:38-46`),
  * `.align` / plain-text transcript parsing with sil/sp removal
    (`dataset.py:128-162`),
  * greedy CTC decode: argmax -> collapse repeats -> drop blanks
    (`utils.py:8-36`).

The decode core is a fixed-shape, jittable function (`ctc_greedy_decode`)
returning padded index sequences + lengths, so it can run batched on TPU;
`indices_to_text` converts on host.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Vocabulary (`dataset.py:38-46`)
# ---------------------------------------------------------------------------

CHARACTERS: str = "abcdefghijklmnopqrstuvwxyz0123456789 "
BLANK_ID: int = 0
PAD_ID: int = len(CHARACTERS) + 1  # 38
VOCAB_SIZE: int = len(CHARACTERS) + 2  # 39: blank + 37 chars + <pad>

CHAR_TO_IDX = {c: i + 1 for i, c in enumerate(CHARACTERS)}
CHAR_TO_IDX["<blank>"] = BLANK_ID
CHAR_TO_IDX["<pad>"] = PAD_ID
IDX_TO_CHAR = {i: c for c, i in CHAR_TO_IDX.items()}


def text_to_indices(text: str) -> np.ndarray:
    """Map text to label indices; unknown characters map to <pad>
    (`dataset.py:164-174`)."""
    return np.array(
        [CHAR_TO_IDX.get(ch, PAD_ID) for ch in text], dtype=np.int32
    )


def indices_to_text(indices: Sequence[int]) -> str:
    """Map indices back to text, skipping blank/pad/unknown — the reference's
    idx_to_char lookup maps blank to '<blank>'; here decode output never
    contains blank so we render only real characters."""
    out = []
    for idx in indices:
        idx = int(idx)
        if idx == BLANK_ID or idx == PAD_ID:
            continue
        ch = IDX_TO_CHAR.get(idx)
        if ch is not None and len(ch) == 1:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Alignment-file parsing (`dataset.py:128-162`)
# ---------------------------------------------------------------------------

def parse_align_text(content: str) -> str:
    """Parse GRID `.align` content or a plain transcript into a sentence.

    Matches the reference: if the first line has no digits it is treated as a
    plain transcript; otherwise each line's third token is a word, `sil`/`sp`
    are removed (by substring replacement, as in `dataset.py:161` —
    preserved verbatim for parity, including its effect on words containing
    'sil'/'sp'), and the result is lowercased.
    """
    first_line = content.split("\n")[0]
    if not any(ch.isdigit() for ch in first_line):
        return content.strip().lower()

    words: List[str] = []
    for line in content.strip().split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) >= 3:
            words.append(parts[2])
        elif len(parts) == 1:
            words.append(parts[0])
    text = " ".join(words).replace("sil", "").replace("sp", "").strip()
    return text.lower()


def load_align_file(path: str) -> str:
    with open(path, "r") as f:
        return parse_align_text(f.read())


# ---------------------------------------------------------------------------
# CTC greedy decode — jittable core
# ---------------------------------------------------------------------------

def ctc_greedy_decode(
    log_probs: jax.Array, blank_id: int = BLANK_ID
) -> Tuple[jax.Array, jax.Array]:
    """Greedy CTC decode on device, batched, fixed shapes.

    Args:
      log_probs: (B, T, V) log-probabilities (or logits; argmax is invariant).
      blank_id: CTC blank index.

    Returns:
      (decoded, lengths): decoded is (B, T) int32, left-packed with the
      collapsed non-blank symbols and padded with blank_id; lengths is (B,).

    Equivalent to `utils.py:8-36`: argmax over vocab, drop positions equal to
    the previous frame's argmax, drop blanks, concatenate. The left-packing
    uses a cumulative-sum scatter so the whole thing is one fused XLA program
    (no host loop, no dynamic shapes).
    """
    pred = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.concatenate(
        [jnp.full(pred.shape[:1] + (1,), blank_id, pred.dtype), pred[:, :-1]],
        axis=1,
    )
    keep = (pred != prev) & (pred != blank_id)  # (B, T)
    #

    # Left-pack kept symbols: position of each kept symbol is the number of
    # kept symbols before it.
    pos = jnp.cumsum(keep, axis=1) - 1  # (B, T), -1 where nothing kept yet
    T = pred.shape[1]
    pos = jnp.where(keep, pos, T)  # dump dropped symbols into overflow slot
    out = jnp.full(pred.shape[:1] + (T + 1,), blank_id, pred.dtype)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, pos, pred)
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out[:, :T], lengths


ctc_greedy_decode_jit = jax.jit(ctc_greedy_decode, static_argnames=("blank_id",))


def decode_batch(
    log_probs, blank_id: int = BLANK_ID, beam_width: int = 0
) -> List[str]:
    """Decode a batch of (B, T, V) log-probs to python strings (host side).

    beam_width=0 (default) is the reference's greedy decode; beam_width>1
    runs prefix beam search (avsync.ops.beam) over the character alphabet.
    """
    if beam_width and beam_width > 1:
        from avsync.ops.beam import ctc_beam_search_batch

        prefixes = ctc_beam_search_batch(
            np.asarray(log_probs), beam_width, blank_id,
            valid_ids=range(1, len(CHARACTERS) + 1),
        )
        return [indices_to_text(p) for p in prefixes]
    decoded, lengths = ctc_greedy_decode_jit(jnp.asarray(log_probs), blank_id)
    decoded = np.asarray(decoded)
    lengths = np.asarray(lengths)
    return [
        indices_to_text(decoded[b, : int(lengths[b])])
        for b in range(decoded.shape[0])
    ]


def decode_prediction(log_probs_single) -> str:
    """Single-sequence decode, mirroring `utils.py:8-36` (T, V) -> str."""
    return decode_batch(jnp.asarray(log_probs_single)[None])[0]


# ---------------------------------------------------------------------------
# TF-stack vocabulary (`train.py:106-121`)
# ---------------------------------------------------------------------------
# The Keras stack uses StringLookup over "abc...z'?! " with an OOV token at
# index 0, model output width vocabulary_size()+1 = 32, and the Keras CTC
# blank at the LAST index (ctc_batch_cost convention), not 0.

TF_CHARACTERS: str = "abcdefghijklmnopqrstuvwxyz'?! "
TF_VOCAB_SIZE: int = len(TF_CHARACTERS) + 1  # 31: OOV(0) + 30 chars
TF_BLANK_ID: int = TF_VOCAB_SIZE  # 31 == last output unit of the 32-way head

TF_CHAR_TO_IDX = {c: i + 1 for i, c in enumerate(TF_CHARACTERS)}
TF_IDX_TO_CHAR = {i + 1: c for i, c in enumerate(TF_CHARACTERS)}


def tf_text_to_indices(text: str, max_len: int = 40) -> np.ndarray:
    """char_to_num + 40-char cap (`train.py:300-305`); unknown chars -> 0."""
    ids = [TF_CHAR_TO_IDX.get(ch, 0) for ch in text][:max_len]
    return np.array(ids, dtype=np.int32)


def tf_indices_to_text(indices: Sequence[int]) -> str:
    """num_to_char join, OOV/blank render as '' (`train.py:596-602`)."""
    return "".join(TF_IDX_TO_CHAR.get(int(i), "") for i in indices)


def tf_decode_batch(log_probs, beam_width: int = 0) -> List[str]:
    """ctc_decode with the Keras blank-last convention
    (`train.py:582-584,874-876`); beam_width>1 opts into prefix beam search
    (the reference uses greedy=True only)."""
    if beam_width and beam_width > 1:
        from avsync.ops.beam import ctc_beam_search_batch

        prefixes = ctc_beam_search_batch(
            np.asarray(log_probs), beam_width, TF_BLANK_ID,
            valid_ids=range(1, TF_VOCAB_SIZE),
        )
        return [tf_indices_to_text(p) for p in prefixes]
    decoded, lengths = ctc_greedy_decode_jit(
        jnp.asarray(log_probs), TF_BLANK_ID
    )
    decoded = np.asarray(decoded)
    lengths = np.asarray(lengths)
    return [
        tf_indices_to_text(decoded[b, : int(lengths[b])])
        for b in range(decoded.shape[0])
    ]
