"""AOT export tests (avsync/export.py): the serialized StableHLO artifact
must reproduce the live LipReader exactly — preprocess, forward and CTC
decode are all inside the module — across batch sizes (symbolic batch
dim), model families, and the embedded-ROI full-frame geometry.

The reference has no ahead-of-time deployment story (its inference path
re-imports torch/TF and the checkpoint, `predict.py:17-105`,
`train.py:998-1075`); this is the TPU-native one.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avsync.config import AvsyncConfig, DataConfig, ModelConfig
from avsync.export import export_transcriber, load_exported

TINY = AvsyncConfig(
    data=DataConfig(img_height=16, img_width=32, max_video_length=8),
    model=ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4)),
)


@pytest.fixture(scope="module")
def lip_ckpt(tmp_path_factory):
    from avsync.compat import save_lipnet_pth
    from avsync.models import LipNet

    root = tmp_path_factory.mktemp("exportd")
    model = LipNet(TINY.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 16, 32, 1))
    )["params"]
    path = str(root / "lipnet.pth")
    save_lipnet_pth(jax.device_get(params), path, conv_shape=(4, 2, 4))
    return path


@pytest.fixture(scope="module")
def artifact(lip_ckpt, tmp_path_factory):
    # 'tpu' included: cross-platform lowering must succeed without a TPU
    # attached (the artifact's whole point is build-here, run-there)
    art = export_transcriber(lip_ckpt, TINY, platforms=("tpu", "cpu"))
    path = str(tmp_path_factory.mktemp("exporta") / "lipnet_serving.npz")
    art.save(path)
    return path


class TestExportedTranscriber:
    def test_roundtrip_matches_live_reader(self, lip_ckpt, artifact):
        from avsync.predictor import LipReader

        back = load_exported(artifact)
        reader = LipReader(lip_ckpt, TINY)
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 255, (3, 8, 16, 32), np.uint8)
        got = back.transcribe(frames)
        assert got == [reader.predict_frames(frames[i]) for i in range(3)]
        ids, lengths, log_probs = back.call(frames)
        clips = jnp.concatenate([reader._prepare(f) for f in frames])
        np.testing.assert_allclose(
            log_probs, np.asarray(reader._logprobs(clips)),
            rtol=1e-5, atol=1e-6,
        )

    def test_symbolic_batch_dim(self, artifact):
        """ONE artifact serves every batch size; per-row results must not
        depend on the batch it rode in."""
        back = load_exported(artifact)
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 255, (8, 8, 16, 32), np.uint8)
        _, _, lp8 = back.call(frames)
        for B in (1, 3, 8):
            _, _, lp = back.call(frames[:B])
            np.testing.assert_allclose(lp, lp8[:B], rtol=1e-5, atol=1e-6)

    def test_short_clip_zero_padded(self, lip_ckpt, artifact):
        from avsync.predictor import LipReader

        back = load_exported(artifact)
        reader = LipReader(lip_ckpt, TINY)
        rng = np.random.default_rng(9)
        short = rng.integers(0, 255, (5, 16, 32), np.uint8)  # T=5 < 8
        assert back.transcribe(short) == [reader.predict_frames(short)]

    def test_metadata_self_describes(self, artifact):
        with np.load(artifact, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
        assert meta["format"] == "avsync-stablehlo-v1"
        assert meta["family"] == "pytorch"
        assert meta["frame_shape"] == [8, 16, 32]
        assert meta["blank_id"] == 0
        assert meta["id_to_char"]["1"] == "a"
        assert meta["platforms"] == ["tpu", "cpu"]
        # full config embedded — a loader can rebuild the exact AvsyncConfig
        assert AvsyncConfig.from_dict(meta["config"]).data.img_width == 32

    def test_loadable_without_avsync(self, lip_ckpt, artifact):
        """The deployment claim: a host with ONLY jax can run the artifact
        — jax.export.deserialize + the embedded JSON metadata, no avsync
        imports in the load path."""
        from jax import export as jexport

        from avsync.predictor import LipReader

        with np.load(artifact, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            module = jexport.deserialize(z["module"].tobytes())
        rng = np.random.default_rng(15)
        frames = rng.integers(0, 255, (2, 8, 16, 32), np.uint8)
        ids, lengths, _ = (np.asarray(x) for x in module.call(frames))
        id_to_char = {int(k): v for k, v in meta["id_to_char"].items()}
        texts = [
            "".join(id_to_char.get(int(i), "")
                    for i in ids[r, : int(lengths[r])])
            for r in range(2)
        ]
        reader = LipReader(lip_ckpt, TINY)
        assert texts == [reader.predict_frames(frames[i]) for i in range(2)]

    def test_wrong_geometry_rejected(self, artifact):
        back = load_exported(artifact)
        with pytest.raises(ValueError, match="expects 16x32"):
            back.call(np.zeros((1, 8, 20, 40), np.uint8))

    def test_float_frames_rejected(self, artifact):
        # a bare astype would floor [0,1]-normalized frames to all-black
        # and silently transcribe garbage — must raise instead
        back = load_exported(artifact)
        with pytest.raises(ValueError, match="uint8"):
            back.call(np.random.default_rng(0).random((1, 8, 16, 32),
                                                      np.float32))

    def test_out_of_range_int_frames_rejected(self, artifact):
        back = load_exported(artifact)
        with pytest.raises(ValueError, match="range"):
            back.call(np.full((1, 8, 16, 32), 300, np.int32))
        # in-range ints are accepted (exact uint8 values)
        ids, _, _ = back.call(np.full((1, 8, 16, 32), 128, np.int32))
        assert ids.shape[0] == 1

    def test_save_writes_exact_path_without_npz_suffix(
            self, artifact, tmp_path):
        # np.savez(path_string) appends '.npz' when missing; save() must
        # write exactly the path the CLI reports
        back = load_exported(artifact)
        out = str(tmp_path / "lipnet_serving.bin")
        back.save(out)
        assert os.path.exists(out) and not os.path.exists(out + ".npz")
        assert load_exported(out).meta == back.meta

    def test_non_artifact_rejected(self, tmp_path):
        bogus = str(tmp_path / "bogus.npz")
        np.savez(bogus, module=np.zeros(4, np.uint8),
                 meta=json.dumps({"format": "other"}))
        with pytest.raises(ValueError, match="not an avsync export"):
            load_exported(bogus)


class TestRoiExport:
    def test_full_frame_geometry_embeds_roi(self, lip_ckpt, tmp_path):
        """Exporting at a non-native geometry bakes the on-device ROI
        program in front of the model — the artifact consumes raw full
        frames and must match the live reader on the same frames."""
        from avsync.predictor import LipReader

        art = export_transcriber(
            lip_ckpt, TINY, frame_geometry=(32, 64), platforms=("cpu",)
        )
        path = str(tmp_path / "roi_serving.npz")
        art.save(path)
        back = load_exported(path)
        assert back.meta["roi"].startswith("embedded:")
        reader = LipReader(lip_ckpt, TINY)
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 255, (2, 8, 32, 64), np.uint8)
        got = back.transcribe(frames)
        assert got == [reader.predict_frames(frames[i]) for i in range(2)]

    def test_host_cascade_roi_not_exportable(self, lip_ckpt):
        import dataclasses

        cfg = dataclasses.replace(
            TINY, data=dataclasses.replace(TINY.data, roi_mode="detector")
        )
        with pytest.raises(ValueError, match="detector"):
            export_transcriber(lip_ckpt, cfg, frame_geometry=(32, 64),
                               platforms=("cpu",))


class TestTfFamilyExport:
    def test_tf_family_roundtrip(self, tmp_path):
        """TF-family export: blank-last 32-way decode + per-clip
        standardization travel inside the module."""
        from avsync.models import make_lipnet
        from avsync.predictor import LipReader
        from avsync.utils.checkpoint import CheckpointManager

        cfg = AvsyncConfig(
            data=DataConfig(img_height=16, img_width=32, max_video_length=8,
                            standardize_clips=True),
            model=ModelConfig(family="tf", hidden_dim=4,
                              conv_channels=(2, 3, 4)),
        )
        model = make_lipnet(cfg.model)
        params = model.init(
            {"params": jax.random.PRNGKey(2)}, jnp.zeros((1, 8, 16, 32, 1))
        )["params"]
        ckpt_dir = str(tmp_path / "tf_ckpt")
        mgr = CheckpointManager(ckpt_dir)
        mgr.save(1, {"params": params}, config=cfg)
        mgr.close()

        art = export_transcriber(ckpt_dir, cfg, platforms=("cpu",))
        path = str(tmp_path / "tf_serving.npz")
        art.save(path)
        back = load_exported(path)
        assert back.meta["family"] == "tf"
        assert back.meta["blank_id"] == 31
        reader = LipReader(ckpt_dir, cfg)
        rng = np.random.default_rng(13)
        frames = rng.integers(0, 255, (2, 8, 16, 32), np.uint8)
        assert back.transcribe(frames) == [
            reader.predict_frames(frames[i]) for i in range(2)
        ]


class TestSyncScorerExport:
    @pytest.fixture(scope="class")
    def det_ckpt(self, tmp_path_factory):
        from avsync.compat import save_detector_pth
        from avsync.models import MisalignmentDetector

        root = tmp_path_factory.mktemp("exportdet")
        det_model = MisalignmentDetector(hidden_dim=16)
        feat_dim = 2 * (4 * 2 * 4) + 40
        dp = det_model.init(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, feat_dim))
        )["params"]
        path = str(root / "detector.pth")
        save_detector_pth(
            jax.device_get(dp), path, feat_dim, 16,
            {"sample_rate": 16000, "n_mfcc": 20, "max_shift_frames": 10},
            conv_shape=(4, 2, 4), n_audio_feats=40,
        )
        return path

    def test_sync_scorer_roundtrip(self, lip_ckpt, det_ckpt, tmp_path):
        """The exported fused pipeline (preprocess + conv stats +
        shift->MFCC->stats + detector) must match the live scorer per
        (clip, shift) pair, across batch sizes."""
        import dataclasses

        from avsync.export import export_sync_scorer
        from avsync.predictor import MisalignmentScorer

        cfg = dataclasses.replace(
            TINY, audio=dataclasses.replace(
                TINY.audio, max_audio_samples=8000
            )
        )
        art = export_sync_scorer(det_ckpt, lip_ckpt, cfg, num_shifts=2,
                                 platforms=("cpu",))
        path = str(tmp_path / "sync_serving.npz")
        art.save(path)
        back = load_exported(path)
        assert back.meta["kind"] == "sync_scorer"
        assert back.meta["num_shifts"] == 2
        live = MisalignmentScorer(det_ckpt, lip_ckpt, cfg)
        rng = np.random.default_rng(17)
        frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
        audio = (rng.standard_normal(4000) * 0.2).astype(np.float32)
        got = back.score_arrays(frames, audio, 25.0, shifts=(0, 2))
        want = live.score_arrays(frames, audio, 25.0, shifts=(0, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # symbolic batch: a 3-row call reproduces the single-row scores
        fb = np.zeros((3, 8, 16, 32), np.uint8)
        fb[:] = frames
        ab = np.zeros((3, 8000), np.float32)
        ab[:, :4000] = audio
        probs = back.call(
            fb, ab, np.full(3, 4000, np.int32), np.full(3, 25.0, np.float32),
            np.tile(np.array([[0, 2]], np.int32), (3, 1)),
        )
        assert probs.shape == (3, 2)
        for r in range(3):
            np.testing.assert_allclose(probs[r], want, rtol=1e-5, atol=1e-6)

    def test_shift_count_mismatch_rejected(self, lip_ckpt, det_ckpt,
                                           tmp_path):
        from avsync.export import export_sync_scorer

        art = export_sync_scorer(det_ckpt, lip_ckpt, TINY, num_shifts=1,
                                 platforms=("cpu",))
        path = str(tmp_path / "sync1.npz")
        art.save(path)
        back = load_exported(path)
        rng = np.random.default_rng(19)
        with pytest.raises(ValueError, match="1 shifts per request"):
            back.score_arrays(
                rng.integers(0, 255, (8, 16, 32), np.uint8),
                np.zeros(100, np.float32), 25.0, shifts=(0, 2),
            )


class TestStaticBuckets:
    """batch_sizes= export mode: one fully static StableHLO module per
    serving bucket in the same artifact (VERDICT r4 Next #3 — closes the
    symbolic-dim warm-throughput penalty). Results must be identical to
    the symbolic-dim artifact at every batch size."""

    @pytest.fixture(scope="class")
    def static_artifact(self, lip_ckpt, tmp_path_factory):
        art = export_transcriber(lip_ckpt, TINY, platforms=("cpu",),
                                 batch_sizes=(1, 2, 4))
        path = str(tmp_path_factory.mktemp("exports") / "static.npz")
        art.save(path)
        return path

    def test_matches_symbolic_artifact(self, artifact, static_artifact):
        sym = load_exported(artifact)
        stat = load_exported(static_artifact)
        assert sym.batch_sizes is None
        assert stat.batch_sizes == [1, 2, 4]
        rng = np.random.default_rng(23)
        frames = rng.integers(0, 255, (4, 8, 16, 32), np.uint8)
        for B in (1, 2, 3, 4):  # 3 pads to the 4-bucket, slices back
            ids_s, len_s, lp_s = sym.call(frames[:B])
            ids_t, len_t, lp_t = stat.call(frames[:B])
            assert lp_t.shape[0] == B
            np.testing.assert_array_equal(ids_t, ids_s)
            np.testing.assert_array_equal(len_t, len_s)
            np.testing.assert_allclose(lp_t, lp_s, rtol=1e-5, atol=1e-6)
            assert stat.transcribe(frames[:B]) == sym.transcribe(frames[:B])

    def test_over_max_bucket_rejected(self, static_artifact):
        back = load_exported(static_artifact)
        with pytest.raises(ValueError, match="largest exported bucket"):
            back.call(np.zeros((5, 8, 16, 32), np.uint8))

    def test_meta_records_buckets(self, static_artifact):
        with np.load(static_artifact, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            assert sorted(z.files) == ["meta", "module_b1", "module_b2",
                                       "module_b4"]
        assert meta["batch_sizes"] == [1, 2, 4]

    def test_static_sync_scorer(self, lip_ckpt, tmp_path):
        import dataclasses

        from avsync.compat import save_detector_pth
        from avsync.export import export_sync_scorer
        from avsync.models import MisalignmentDetector

        det_model = MisalignmentDetector(hidden_dim=16)
        feat_dim = 2 * (4 * 2 * 4) + 40
        dp = det_model.init(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, feat_dim))
        )["params"]
        det = str(tmp_path / "det.pth")
        save_detector_pth(
            jax.device_get(dp), det, feat_dim, 16,
            {"sample_rate": 16000, "n_mfcc": 20, "max_shift_frames": 10},
            conv_shape=(4, 2, 4), n_audio_feats=40,
        )
        cfg = dataclasses.replace(
            TINY, audio=dataclasses.replace(TINY.audio,
                                            max_audio_samples=8000)
        )
        sym = export_sync_scorer(det, lip_ckpt, cfg, num_shifts=1,
                                 platforms=("cpu",))
        stat = export_sync_scorer(det, lip_ckpt, cfg, num_shifts=1,
                                  platforms=("cpu",), batch_sizes=(2,))
        p = str(tmp_path / "sync_static.npz")
        stat.save(p)
        stat = load_exported(p)
        assert stat.batch_sizes == [2]
        rng = np.random.default_rng(29)
        frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
        audio = (rng.standard_normal(4000) * 0.2).astype(np.float32)
        got = stat.score_arrays(frames, audio, 25.0, shifts=(0,))
        want = sym.score_arrays(frames, audio, 25.0, shifts=(0,))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_artifact_service_clamps_max_batch(self, static_artifact):
        from avsync.serving import ArtifactTranscribeService

        svc = ArtifactTranscribeService(static_artifact, max_batch=8,
                                        max_wait_ms=1.0)
        try:
            assert svc.batcher.max_batch == 4
            rng = np.random.default_rng(31)
            frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
            live = load_exported(static_artifact)
            assert (svc.transcribe_frames(frames)
                    == live.transcribe(frames)[0])
        finally:
            svc.close()

    def test_cli_batch_sizes_flag(self, lip_ckpt, tmp_path, capsys):
        from avsync.cli import build_parser

        out = str(tmp_path / "cli_static.npz")
        cfg_path = str(tmp_path / "tiny.json")
        with open(cfg_path, "w") as f:
            f.write(TINY.to_json())
        args = build_parser().parse_args([
            "export", "--checkpoint", lip_ckpt, "--config", cfg_path,
            "--out", out, "--platforms", "cpu", "--batch_sizes", "1,2",
        ])
        assert args.fn(args) == 0
        assert "static buckets [1, 2]" in capsys.readouterr().out
        assert load_exported(out).batch_sizes == [1, 2]


class TestExportCli:
    def test_cmd_export_writes_artifact(self, lip_ckpt, tmp_path, capsys):
        from avsync.cli import build_parser

        out = str(tmp_path / "cli_serving.npz")
        cfg_path = str(tmp_path / "tiny.json")
        with open(cfg_path, "w") as f:
            f.write(TINY.to_json())
        args = build_parser().parse_args([
            "export", "--checkpoint", lip_ckpt, "--config", cfg_path,
            "--out", out, "--platforms", "cpu",
        ])
        assert args.fn(args) == 0
        assert os.path.exists(out)
        assert "exported" in capsys.readouterr().out
        back = load_exported(out)
        assert back.meta["frame_shape"] == [8, 16, 32]
