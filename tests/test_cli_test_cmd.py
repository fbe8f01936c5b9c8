"""CLI `test` subcommand: checkpoint -> CER/WER JSON on the test split."""

import json
import os

import numpy as np
import pytest

from avsync.config import (
    AvsyncConfig,
    DataConfig,
    ModelConfig,
)
from avsync.data import synthetic


def test_cmd_test_writes_results(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from avsync.cli import main
    from avsync.compat import save_lipnet_pth
    from avsync.models import LipNet

    corpus = str(tmp_path / "data")
    synthetic.write_corpus(
        corpus, n_speakers=3, clips_per_speaker=2,
        n_frames=8, height=16, width=32, seed=17, with_audio=False,
    )
    cfg = AvsyncConfig(
        data=DataConfig(
            data_path=corpus, img_height=16, img_width=32,
            max_video_length=8, batch_size=2, max_label_length=6,
        ),
        model=ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4)),
    )
    cfg_path = str(tmp_path / "cfg.json")
    open(cfg_path, "w").write(cfg.to_json())

    model = LipNet(cfg.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 16, 32, 1))
    )["params"]
    pth = str(tmp_path / "lip.pth")
    save_lipnet_pth(jax.device_get(params), pth, conv_shape=(4, 2, 4))

    out = str(tmp_path / "results.json")
    rc = main([
        "test", "--data_path", corpus, "--config", cfg_path,
        "--checkpoint", pth, "--output", out,
    ])
    assert rc == 0
    results = json.load(open(out))
    assert results["num_samples"] == 2  # test split = 1 speaker x 2 clips
    assert 0.0 <= results["wer"] <= 1.0
    assert "Predicted text:" in capsys.readouterr().out


def test_cmd_test_quantize_int8(tmp_path, capsys):
    """--quantize int8 runs the int8 conv-stack eval path end-to-end and
    produces the same results artifact schema; with a trained-free random
    model both paths decode from near-uniform log-probs, so we assert the
    artifact, not WER equality (accuracy parity is bounded in
    tests/test_quant.py)."""
    import jax
    import jax.numpy as jnp

    from avsync.cli import main
    from avsync.compat import save_lipnet_pth
    from avsync.models import LipNet

    corpus = str(tmp_path / "data")
    synthetic.write_corpus(
        corpus, n_speakers=3, clips_per_speaker=2,
        n_frames=8, height=16, width=32, seed=23, with_audio=False,
    )
    cfg = AvsyncConfig(
        data=DataConfig(
            data_path=corpus, img_height=16, img_width=32,
            max_video_length=8, batch_size=2, max_label_length=6,
        ),
        model=ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4)),
    )
    cfg_path = str(tmp_path / "cfg.json")
    open(cfg_path, "w").write(cfg.to_json())

    model = LipNet(cfg.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 16, 32, 1))
    )["params"]
    pth = str(tmp_path / "lip.pth")
    save_lipnet_pth(jax.device_get(params), pth, conv_shape=(4, 2, 4))

    out = str(tmp_path / "results_q.json")
    rc = main([
        "test", "--data_path", corpus, "--config", cfg_path,
        "--checkpoint", pth, "--output", out, "--quantize", "int8",
    ])
    assert rc == 0
    results = json.load(open(out))
    assert results["num_samples"] == 2
    assert 0.0 <= results["wer"] <= 1.0


def test_cmd_test_quantize_rejects_unknown_mode(tmp_path, capsys):
    from avsync.cli import main

    with pytest.raises(SystemExit):
        main([
            "test", "--data_path", str(tmp_path),
            "--checkpoint", "x.pth", "--quantize", "int4",
        ])
