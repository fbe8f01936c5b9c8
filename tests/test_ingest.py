"""Native libav ingest tests (built on demand; skipped without a toolchain)."""

import numpy as np
import pytest

from avsync.ingest import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest library not available"
)


@pytest.fixture(scope="module")
def mjpg_video(tmp_path_factory):
    """A real container (MJPG .avi) written through cv2, with known frames."""
    import cv2

    path = str(tmp_path_factory.mktemp("ingest") / "clip.avi")
    rng = np.random.default_rng(0)
    T, H, W = 12, 48, 64
    # smooth frames so MJPG stays near-lossless
    base = rng.random((H, W)).astype(np.float32)
    frames = []
    for t in range(T):
        f = np.clip(base * 150 + t * 5, 0, 255).astype(np.uint8)
        frames.append(f)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (W, H))
    assert vw.isOpened()
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()
    return path, np.stack(frames)


class TestVideoDecode:
    def test_decodes_all_frames(self, mjpg_video):
        path, ref = mjpg_video
        video, fps, _, _ = native.decode(path)
        assert video.shape == ref.shape
        assert abs(fps - 25.0) < 1e-3
        # MJPG is lossy; frames must still be close
        assert np.abs(video.astype(int) - ref.astype(int)).mean() < 4.0

    def test_matches_cv2_decode(self, mjpg_video):
        import cv2

        path, _ = mjpg_video
        video, _, _, _ = native.decode(path)
        cap = cv2.VideoCapture(path)
        cv_frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            cv_frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY))
        cap.release()
        cv_frames = np.stack(cv_frames)
        assert video.shape == cv_frames.shape
        # both go JPEG->RGB->gray; allow ±2 rounding between swscale and cv2
        assert np.abs(video.astype(int) - cv_frames.astype(int)).max() <= 2

    def test_max_frames_cap(self, mjpg_video):
        path, _ = mjpg_video
        video, _, _, _ = native.decode(path, max_frames=5)
        assert video.shape[0] == 5

    def test_get_fps(self, mjpg_video):
        path, _ = mjpg_video
        assert abs(native.get_fps(path) - 25.0) < 1e-3


class TestAudioDecode:
    def test_wav_roundtrip(self, tmp_path):
        from avsync.data.video import load_wav, save_wav

        sig = (np.sin(np.linspace(0, 100, 16000)) * 0.6).astype(np.float32)
        p = str(tmp_path / "t.wav")
        save_wav(p, sig, 16000)
        audio, sr = native.decode_audio(p)
        ref, _ = load_wav(p)
        assert sr == 16000
        assert abs(len(audio) - len(ref)) <= 2
        n = min(len(audio), len(ref))
        np.testing.assert_allclose(audio[:n], ref[:n], atol=1e-4)

    def test_resample_to_16k(self, tmp_path):
        from avsync.data.video import save_wav

        sr0 = 48000
        t = np.arange(sr0) / sr0
        sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        p = str(tmp_path / "t48.wav")
        save_wav(p, sig, sr0)
        audio, sr = native.decode_audio(p, target_sr=16000)
        assert sr == 16000
        assert abs(len(audio) - 16000) < 50
        spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
        peak = np.argmax(spec) * sr / len(audio)
        assert abs(peak - 440) < 5

    def test_missing_file_raises(self):
        with pytest.raises(RuntimeError):
            native.decode("/nonexistent/file.mpg")


class TestPipelineIntegration:
    def test_decode_video_gray_prefers_native(self, mjpg_video, monkeypatch):
        from avsync.data import video as vid

        path, ref = mjpg_video
        out = vid.decode_video_gray(path, max_frames=6)
        assert out.shape[0] == 6
        assert out.shape[1:] == ref.shape[1:]


class TestBatchDecode:
    def test_batch_matches_single(self, mjpg_video):
        path, ref = mjpg_video
        results = native.decode_batch([path, path, path], n_threads=2)
        assert len(results) == 3
        single, fps, _, _ = native.decode(path)
        for video, f, audio, sr in results:
            np.testing.assert_array_equal(video, single)
            assert abs(f - 25.0) < 1e-3

    def test_corrupt_path_yields_empty_not_raise(self, mjpg_video):
        path, _ = mjpg_video
        results = native.decode_batch([path, "/nonexistent/x.mpg"])
        assert results[0][0].shape[0] > 0
        assert results[1][0].size == 0 and results[1][3] == 0

    def test_max_frames_applied(self, mjpg_video):
        path, _ = mjpg_video
        (video, _, _, _), = native.decode_batch([path], max_frames=4)
        assert video.shape[0] == 4


class TestRoiDecode:
    def test_roi_batch_geometry_and_content(self, mjpg_video):
        path, ref = mjpg_video  # 12 frames, 48x64
        (video, fps, _, _), = native.decode_batch_roi(
            [path], crop=(0.5, 1.0, 0.25, 0.75), out_hw=(20, 30)
        )
        assert video.shape == (12, 20, 30)
        assert abs(fps - 25.0) < 1e-3
        # content: ROI decode of the lower-middle region should correlate
        # strongly with a host-side crop+resize of the full decode
        import cv2

        full, _, _, _ = native.decode(path)
        manual = cv2.resize(full[0, 24:48, 16:48], (30, 20))
        a = video[0].astype(np.float32)
        b = manual.astype(np.float32)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.95, corr

    def test_roi_single_threaded_deterministic(self, mjpg_video):
        path, _ = mjpg_video
        r1 = native.decode_batch_roi([path], (0.4, 0.9, 0.1, 0.9), (16, 24))
        r2 = native.decode_batch_roi([path], (0.4, 0.9, 0.1, 0.9), (16, 24), n_threads=1)
        np.testing.assert_array_equal(r1[0][0], r2[0][0])


class TestMuxer:
    """avs_mux_mp4: libx264+aac mp4 artifacts (the reference demo's format,
    `misalignment_detection_demo.py:231-237`), round-tripped through the
    decoder."""

    def test_mux_roundtrip_video_audio(self, tmp_path):
        from avsync.ingest import native

        if not native.available():
            pytest.skip("native ingest library unavailable")
        rng = np.random.default_rng(0)
        T, sr = 25, 16000
        frames = (rng.random((T, 50, 100, 3)) * 255).astype(np.uint8)
        t = np.arange(int(sr * T / 25.0)) / sr
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "demo.mp4")
        native.mux_mp4(path, frames, 25.0, audio, sr)
        v, fps, a, got_sr = native.decode(path, 0, sr)
        assert v.shape == (T, 50, 100)  # exact frame count preserved
        assert fps == pytest.approx(25.0)
        assert got_sr == sr
        # AAC is lossy + padded; the tone must survive with full duration
        assert a.size >= audio.size
        assert np.abs(a[: audio.size]).max() > 0.2

    def test_mux_video_only_and_odd_dims(self, tmp_path):
        from avsync.ingest import native

        if not native.available():
            pytest.skip("native ingest library unavailable")
        rng = np.random.default_rng(1)
        frames = (rng.random((6, 51, 101, 3)) * 255).astype(np.uint8)
        path = str(tmp_path / "v.mp4")
        native.mux_mp4(path, frames, 25.0)  # odd dims -> cropped to even
        v, fps, a, _ = native.decode(path, 0, 0)
        assert v.shape == (6, 50, 100)
        assert a.size == 0
