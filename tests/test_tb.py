"""TensorBoard event-file writer: wire-format round-trip + trainer wiring.

The writer emits real tensorflow.Event protos in TFRecord framing with
masked CRC32C (avsync/utils/tb.py) — the reference's Keras TensorBoard
callback artifact (`train.py:745-748`) without a TF dependency.
"""

import glob
import os

import numpy as np
import pytest

from avsync.utils import tb


class TestWireFormat:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vectors for CRC32C (Castagnoli)
        assert tb.crc32c(b"") == 0x0
        assert tb.crc32c(b"123456789") == 0xE3069283
        assert tb.crc32c(bytes(32)) == 0x8A9136AA

    def test_varint_roundtrip(self):
        for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
            buf = tb._varint(n)
            got, pos = tb._read_varint(buf, 0)
            assert got == n and pos == len(buf)
        # negative int64 (two's complement, 10 bytes)
        buf = tb._varint(-1)
        got, _ = tb._read_varint(buf, 0)
        assert got == 2**64 - 1

    def test_scalar_roundtrip(self, tmp_path):
        w = tb.SummaryWriter(str(tmp_path))
        w.add_scalar("epoch_loss", 3.5, 1)
        w.add_scalar("epoch_loss", 2.25, 2)
        w.add_scalar("epoch_lr", 1e-4, 2)
        w.close()
        events = tb.read_scalars(w.path)
        assert events[0]["file_version"] == "brain.Event:2"
        scalars = [e for e in events if "tag" in e]
        assert [(e["tag"], e["step"]) for e in scalars] == [
            ("epoch_loss", 1), ("epoch_loss", 2), ("epoch_lr", 2),
        ]
        assert scalars[0]["value"] == pytest.approx(3.5)
        assert scalars[2]["value"] == pytest.approx(1e-4, rel=1e-6)
        assert all(e["wall_time"] > 1e9 for e in scalars)


class TestTrainerWiring:
    def test_train_writes_event_files(self, tmp_path):
        from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
        from avsync.parallel import make_mesh
        from avsync.train import LipNetTrainer
        from avsync.utils.logging import Logger

        cfg = AvsyncConfig(
            model=ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4)),
            train=TrainConfig(
                learning_rate=1e-3, checkpoint_every=10,
                tensorboard=True, log_dir=str(tmp_path / "tb"),
            ),
        )
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)

        def loader():
            labels = rng.integers(1, 37, size=(8, 4)).astype(np.int32)
            return [{
                "video": rng.random((8, 12, 16, 32, 1)).astype(np.float32),
                "labels": np.pad(labels, ((0, 0), (0, 2))),
                "label_lengths": np.full((8,), 4, np.int32),
            }]

        trainer.train(loader, loader, epochs=2,
                      checkpoint_dir=str(tmp_path / "ck"))
        train_files = glob.glob(
            str(tmp_path / "tb" / "*" / "train" / "events.out.tfevents.*")
        )
        val_files = glob.glob(
            str(tmp_path / "tb" / "*" / "validation" / "events.out.tfevents.*")
        )
        assert len(train_files) == 1 and len(val_files) == 1
        scalars = [e for e in tb.read_scalars(train_files[0]) if "tag" in e]
        assert {e["tag"] for e in scalars} == {"epoch_loss", "epoch_lr"}
        assert max(e["step"] for e in scalars) == 2
