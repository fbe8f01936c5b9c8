"""Observability subsystem tests."""

import os

import numpy as np

from avsync.utils.profiling import MetricsWriter, StepTimer, trace


class TestStepTimer:
    def test_summary_excludes_warmup(self, monkeypatch):
        # fake clock: real time.sleep overshoots arbitrarily under
        # full-suite load on this single-core box (observed flake), and
        # the unit under test is the bookkeeping, not the OS scheduler
        now = [0.0]
        durations = iter((0.05, 0.01, 0.01))
        from avsync.utils import profiling as prof

        calls = {"entered": False}

        def fake_clock():
            if not calls["entered"]:  # __enter__ stamp
                calls["entered"] = True
            else:  # __exit__ stamp: advance by this step's duration
                now[0] += next(durations)
                calls["entered"] = False
            return now[0]

        monkeypatch.setattr(prof.time, "perf_counter", fake_clock)
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 2
        assert abs(s["mean_s"] - 0.01) < 1e-9  # 50 ms warmup excluded
        assert abs(s["total_s"] - 0.07) < 1e-9

    def test_empty(self):
        assert StepTimer().summary() == {"steps": 0}


class TestMetricsWriter:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        w = MetricsWriter(p)
        w.write(1, loss=3.5, lr=1e-4)
        w.write(2, loss=np.float32(2.5), note="ok")
        w.close()
        recs = MetricsWriter.read(p)
        assert len(recs) == 2
        assert recs[0]["loss"] == 3.5
        assert recs[1]["loss"] == 2.5
        assert recs[1]["note"] == "ok"

    def test_trainer_writes_metrics(self, tmp_path):
        from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
        from avsync.parallel import make_mesh
        from avsync.train import LipNetTrainer
        from avsync.utils.logging import Logger

        cfg = AvsyncConfig(
            model=ModelConfig(hidden_dim=4, conv_channels=(2, 2, 2)),
            train=TrainConfig(learning_rate=1e-3),
        )
        tr = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        rng = np.random.default_rng(0)
        batch = {
            "video": rng.random((8, 6, 16, 16, 1)).astype(np.float32),
            "labels": np.pad(rng.integers(1, 37, (8, 2)).astype(np.int32), ((0, 0), (0, 1))),
            "label_lengths": np.full((8,), 2, np.int32),
        }
        state = tr.init_state(batch)
        p = str(tmp_path / "steps.jsonl")
        w = MetricsWriter(p)
        tr.train_epoch(state, [batch, batch], metrics_writer=w)
        w.close()
        recs = MetricsWriter.read(p)
        assert len(recs) == 2
        assert all("grad_norm" in r and "loss" in r for r in recs)
        assert recs[1]["step"] == recs[0]["step"] + 1


class TestTrace:
    def test_trace_noop_or_writes(self, tmp_path):
        d = str(tmp_path / "trace")
        with trace(d):
            _ = np.zeros(4) + 1
        # either wrote something or warned-and-skipped; both acceptable
        assert True
