"""Tests for avsync.text: vocab, align parsing, CTC greedy decode."""

import jax.numpy as jnp
import numpy as np
import pytest

from avsync import text


class TestVocab:
    def test_vocab_size_and_special_ids(self):
        # 37 characters + blank + pad = 39 entries (`dataset.py:41-46`)
        assert text.VOCAB_SIZE == 39
        assert text.BLANK_ID == 0
        assert text.PAD_ID == 38
        assert text.CHAR_TO_IDX["a"] == 1
        assert text.CHAR_TO_IDX[" "] == 37
        assert text.CHAR_TO_IDX["0"] == 27

    def test_text_to_indices_roundtrip(self):
        s = "bin blue at f nine please"
        idx = text.text_to_indices(s)
        assert text.indices_to_text(idx) == s

    def test_unknown_char_maps_to_pad(self):
        idx = text.text_to_indices("a!b")
        assert list(idx) == [1, text.PAD_ID, 2]


class TestAlignParsing:
    def test_standard_grid_align(self):
        content = (
            "0 23750 sil\n"
            "23750 29500 bin\n"
            "29500 34000 blue\n"
            "34000 35500 at\n"
            "35500 41000 f\n"
            "41000 47250 nine\n"
            "47250 53000 please\n"
            "53000 74500 sil\n"
        )
        assert text.parse_align_text(content) == "bin blue at f nine please"

    def test_plain_text_transcript(self):
        assert text.parse_align_text("Set Green In X Eight Again\n") == (
            "set green in x eight again"
        )

    def test_single_token_lines(self):
        content = "100 200 lay\n300 400 red\n"
        assert text.parse_align_text(content) == "lay red"

    def test_comment_lines_skipped(self):
        # Note: the first line must contain a digit or the whole file is
        # treated as a plain transcript (`dataset.py:141`).
        content = "#header 1\n0 10 sil\n10 20 now\n"
        assert text.parse_align_text(content) == "now"


class TestCTCGreedyDecode:
    def _logits_from_path(self, path, vocab=39):
        """Build (T, V) log-probs whose argmax follows `path`."""
        T = len(path)
        x = np.full((T, vocab), -10.0, dtype=np.float32)
        for t, p in enumerate(path):
            x[t, p] = 0.0
        return x

    def test_collapse_repeats_and_blanks(self):
        # path: b l a n k-separated "ab", with repeats
        # argmax sequence: [1,1,0,2,2,0,0,2] -> "a","b","b" collapsed -> a b b
        path = [1, 1, 0, 2, 2, 0, 0, 2]
        lp = self._logits_from_path(path)
        out = text.decode_prediction(lp)
        assert out == "abb"

    def test_reference_decode_semantics_vs_python(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            T = 30
            lp = rng.normal(size=(T, 39)).astype(np.float32)
            pred = lp.argmax(-1)
            # reference loop (`utils.py:20-36`)
            decoded, prev = [], 0
            for ch in pred:
                if ch != prev and ch != 0:
                    decoded.append(int(ch))
                prev = ch
            expect = "".join(
                text.IDX_TO_CHAR[i]
                for i in decoded
                if i in text.IDX_TO_CHAR and len(text.IDX_TO_CHAR[i]) == 1
            )
            assert text.decode_prediction(lp) == expect

    def test_batched_decode(self):
        lp1 = self._logits_from_path([1, 0, 2])
        lp2 = self._logits_from_path([3, 3, 0])
        batch = np.stack([lp1, lp2])
        assert text.decode_batch(batch) == ["ab", "c"]

    def test_all_blank(self):
        lp = self._logits_from_path([0, 0, 0, 0])
        assert text.decode_prediction(lp) == ""

    def test_decoded_lengths(self):
        lp = self._logits_from_path([1, 1, 0, 1])
        dec, lengths = text.ctc_greedy_decode(jnp.asarray(lp)[None])
        assert int(lengths[0]) == 2
        assert list(np.asarray(dec)[0, :2]) == [1, 1]
