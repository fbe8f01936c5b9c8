"""Data-structure tooling tests (`utils.py:90-265` parity)."""

import os

import numpy as np
import pytest

from avsync.data import tooling
from avsync.data.grid import GridDataSource


@pytest.fixture
def videos_only(tmp_path):
    """Speaker dirs with videos but no transcripts."""
    for s in ("s1", "s2"):
        d = tmp_path / s
        d.mkdir()
        for c in range(3):
            np.save(str(d / f"clip{c}.npy"), np.zeros((2, 4, 4), np.uint8))
    return str(tmp_path)


class TestDummyAlignments:
    def test_creates_and_makes_speakers_usable(self, videos_only):
        n = tooling.create_dummy_alignments(videos_only, seed=1)
        assert n == 6
        src = GridDataSource(videos_only)
        assert len(src) == 6
        assert all(s.text in tooling.GRID_PHRASES for s in src.samples)

    def test_deterministic(self, videos_only):
        tooling.create_dummy_alignments(videos_only, seed=7)
        texts1 = [s.text for s in GridDataSource(videos_only).samples]
        # delete + regenerate with the same seed
        for root, _, files in os.walk(videos_only):
            for f in files:
                if f.endswith(".txt"):
                    os.remove(os.path.join(root, f))
        tooling.create_dummy_alignments(videos_only, seed=7)
        texts2 = [s.text for s in GridDataSource(videos_only).samples]
        assert texts1 == texts2

    def test_respects_per_speaker_cap(self, videos_only):
        n = tooling.create_dummy_alignments(videos_only, per_speaker=1)
        assert n == 2


class TestInteractiveRepair:
    def test_assume_yes_repairs(self, videos_only, capsys):
        speakers = tooling.check_data_structure_interactive(
            videos_only, assume_yes=True
        )
        assert speakers == ["s1", "s2"]
        assert "Created 6 dummy alignment files" in capsys.readouterr().out

    def test_assume_no_returns_empty(self, videos_only):
        assert tooling.check_data_structure_interactive(
            videos_only, assume_yes=False
        ) == []

    def test_already_valid_short_circuits(self, videos_only):
        tooling.create_dummy_alignments(videos_only)
        assert tooling.check_data_structure_interactive(
            videos_only, assume_yes=False
        ) == ["s1", "s2"]


class TestFindAlignmentFiles:
    def test_finds_sibling_align_dir(self, tmp_path):
        data = tmp_path / "corpus"
        (data / "s1_processed").mkdir(parents=True)
        (tmp_path / "align").mkdir()
        found = tooling.find_alignment_files(str(data), verbose=False)
        assert found == str(tmp_path / "align")

    def test_none_when_absent(self, tmp_path):
        (tmp_path / "s1").mkdir()
        assert tooling.find_alignment_files(str(tmp_path), verbose=False) is None
