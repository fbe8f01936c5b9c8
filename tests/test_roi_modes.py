"""ROI-mode pipeline tests: heuristic vs detector vs variance paths."""

import numpy as np
import pytest

from avsync.config import AvsyncConfig, DataConfig
from avsync.data import GridDataSource, LipNetBatcher, synthetic


@pytest.fixture(scope="module")
def fullframe_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("roi") / "data")
    synthetic.write_corpus(
        root, n_speakers=1, clips_per_speaker=2, preprocessed=False,
        n_frames=6, height=12, width=20, seed=13, with_audio=False,
    )
    return root


@pytest.mark.parametrize("roi_mode", ["heuristic", "detector", "variance"])
def test_all_roi_modes_produce_batches(fullframe_corpus, roi_mode):
    cfg = AvsyncConfig(
        data=DataConfig(
            data_path=fullframe_corpus, img_height=12, img_width=20,
            max_video_length=6, batch_size=2, roi_mode=roi_mode,
        )
    )
    batcher = LipNetBatcher(GridDataSource(fullframe_corpus), cfg)
    (batch,) = list(batcher.epoch(shuffle=False))
    v = np.asarray(batch["video"])
    assert v.shape == (2, 6, 12, 20, 1)
    assert np.isfinite(v).all()
    assert 0.0 <= v.min() and v.max() <= 1.0


def test_variance_mode_crops_the_active_region(fullframe_corpus):
    """The synthetic 'mouth' is the temporally active region — the variance
    crop must contain more motion than the full frame on average."""
    cfg_var = AvsyncConfig(
        data=DataConfig(
            data_path=fullframe_corpus, img_height=12, img_width=20,
            max_video_length=6, batch_size=2, roi_mode="variance",
        )
    )
    b_var = LipNetBatcher(GridDataSource(fullframe_corpus), cfg_var)
    (batch,) = list(b_var.epoch(shuffle=False))
    crop_var = np.asarray(batch["video"]).var(axis=1).mean()
    assert crop_var > 0
