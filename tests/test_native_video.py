"""Native C++ video loader (libmccvideo) + batched detection pipeline tests.

The loader is built from native/src/video_loader.cc on demand; these tests
skip if the toolchain/ffmpeg libs are unavailable (they are baked into the
target image). Fixtures are uncompressed YUV4MPEG2 written by write_y4m —
full-range, so the gray path round-trips exactly.
"""
import numpy as np
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.detection.native_video import (
    available,
    NativeVideoReader,
    write_y4m,
)
from multicam_calibration_tpu.detection.synthetic_images import (
    random_view_homography,
    render_board_view,
)

pytestmark = pytest.mark.skipif(not available(), reason="libmccvideo unavailable")

BOARD = (5, 7)


def _board_frames(n, seed0=0, size=(480, 640)):
    frames, gts = [], []
    for k in range(n):
        rng = np.random.default_rng(seed0 + k)
        H = random_view_homography(rng, board_shape=BOARD)
        view, gt = render_board_view(
            H, out_size=size, board_shape=BOARD, noise=1.5, seed=seed0 + k
        )
        frames.append(np.asarray(view).astype(np.uint8))
        gts.append(gt)
    return np.stack(frames), gts


class TestNativeReader:
    def test_gray_roundtrip_exact(self, tmp_path, rng):
        frames = rng.integers(0, 255, (12, 48, 64)).astype(np.uint8)
        p = str(tmp_path / "t.y4m")
        write_y4m(p, frames)
        with NativeVideoReader(p, gray=True) as r:
            assert (r.width, r.height) == (64, 48)
            assert len(r) == 12
            got = r.read_batch(12)
        np.testing.assert_array_equal(got, frames)

    def test_seek_and_iterate(self, tmp_path, rng):
        frames = rng.integers(0, 255, (10, 48, 64)).astype(np.uint8)
        p = str(tmp_path / "s.y4m")
        write_y4m(p, frames)
        with NativeVideoReader(p, gray=True) as r:
            np.testing.assert_array_equal(r[7], frames[7])
            np.testing.assert_array_equal(r[2], frames[2])  # backward seek
            r2 = r.read_batch(100)
            assert r2.shape[0] == 7  # frames 3..9

    def test_bgr_smooth_content(self, tmp_path):
        yy, xx = np.mgrid[0:48, 0:64]
        sm = np.zeros((3, 48, 64, 3), np.uint8)
        for c in range(3):
            sm[..., c] = (yy * 2 + xx + c * 30) % 256
        p = str(tmp_path / "c.y4m")
        write_y4m(p, sm)
        with NativeVideoReader(p) as r:
            got = r.read_batch(3)
        # 4:2:0 chroma subsampling costs a few counts on smooth gradients.
        assert np.abs(got.astype(int) - sm.astype(int)).max() <= 6

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            NativeVideoReader(str(tmp_path / "nope.y4m"))


class TestNativeWriter:
    def test_writer_roundtrip_mp4(self, tmp_path):
        from multicam_calibration_tpu.detection.native_video import (
            NativeVideoWriter,
        )

        yy, xx = np.mgrid[0:96, 0:128]
        frames = np.stack(
            [
                (100 + 50 * np.sin(yy / 15 + k * 0.3) + 50 * np.cos(xx / 20))
                .astype(np.uint8)
                for k in range(6)
            ]
        )
        p = str(tmp_path / "w.mp4")
        with NativeVideoWriter(p, 128, 96, fps=30, gray=True) as w:
            for f in frames:
                w.write(f)
        with NativeVideoReader(p, gray=True) as r:
            back = r.read_batch(6)
        assert back.shape[0] == 6
        assert np.abs(back.astype(float) - frames.astype(float)).mean() < 3

    def test_overlay_detections_end_to_end(self, tmp_path):
        import os

        frames, _ = _board_frames(3, seed0=40)
        p = str(tmp_path / "ov.y4m")
        write_y4m(p, frames)
        mct.process_video(p, mct.detect_chessboard, {"board_shape": BOARD})
        out = mct.overlay_detections(p, frame_range=(0, 3), overwrite=True)
        assert os.path.exists(out)
        with NativeVideoReader(out) as r:
            got = r.read_batch(3)
        assert got.shape == (3, 480, 640, 3)
        # Overlay dots/lines actually changed pixels vs the source frames.
        src = np.repeat(frames[:3][..., None], 3, axis=-1)
        assert np.abs(got.astype(int) - src.astype(int)).max() > 50


class TestBatchedVideoDetection:
    def test_detect_chessboard_batch_matches_single(self):
        frames, gts = _board_frames(4)
        found = mct.detect_chessboard_batch(
            list(frames), board_shape=BOARD
        )
        assert len(found) >= 3  # rendering occasionally defeats one frame
        for i, (uvs, scores) in found.items():
            single = mct.detect_chessboard(frames[i], board_shape=BOARD)
            assert single is not None
            np.testing.assert_allclose(uvs, single[0], atol=1e-3)

    def test_end_to_end_video_detection(self, tmp_path):
        frames, gts = _board_frames(5, seed0=20)
        paths = []
        for cam in range(2):
            p = str(tmp_path / f"cam{cam}.y4m")
            write_y4m(p, frames)
            paths.append(p)
        uvs, img_sizes = mct.run_calibration_detection(
            paths, mct.detect_chessboard, {"board_shape": BOARD}
        )
        assert uvs.shape[:2] == (2, 5)
        assert uvs.shape[2] == BOARD[0] * BOARD[1]
        assert img_sizes == [(640, 480), (640, 480)]
        detected = ~np.isnan(uvs).any((-1, -2))
        assert detected.sum() >= 6  # most frames detected in both cameras
        # Detections land within a pixel of the render's ground truth.
        for c in range(2):
            for f in range(5):
                if detected[c, f]:
                    assert np.abs(uvs[c, f] - gts[f]).max() < 1.5
