"""Config system + CLI end-to-end tests (real mp4 videos -> calibration)."""
import json
import os

import numpy as np
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.utils.config import (
    PipelineConfig,
    load_config,
    save_config,
)


class TestConfig:
    def test_defaults(self):
        cfg = PipelineConfig()
        assert tuple(cfg.board.shape) == (5, 7)
        assert cfg.ba.loss == "soft_l1"

    def test_yaml_roundtrip(self, tmp_path):
        cfg = PipelineConfig()
        cfg.ba.ftol = 1e-6
        path = save_config(cfg, str(tmp_path / "cfg.yaml"))
        cfg2 = load_config(path)
        assert cfg2.ba.ftol == 1e-6
        assert tuple(cfg2.board.shape) == (5, 7)

    def test_overrides(self):
        cfg = load_config(overrides={"ba.max_iters": 7, "board.square_size": 10.0})
        assert cfg.ba.max_iters == 7
        assert cfg.board.square_size == 10.0

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "bad.yaml"
        p.write_text("ba:\n  not_a_field: 1\n")
        with pytest.raises(ValueError, match="unknown keys"):
            load_config(str(p))
        with pytest.raises(ValueError, match="unknown config sections"):
            load_config(overrides=None, path=str(_write(tmp_path, "sec.yaml", "nope:\n  a: 1\n")))


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def _render_camera_video(path, K, ext_cam, board_poses, board_shape, square_size,
                         img_size, square_px=40, margin=2):
    """Write an mp4 of homography-rendered board views for one camera."""
    import cv2

    from multicam_calibration_tpu.detection.synthetic_images import (
        render_board_image,
    )
    from multicam_calibration_tpu.synthetic import _t6_to_T, _project_np

    canonical, can_corners = render_board_image(board_shape, square_px, margin)
    objpoints = mct.generate_chessboard_objpoints(board_shape, square_size)
    w, h = img_size
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h), isColor=False
    )
    assert writer.isOpened()
    gts = []
    for pose in board_poses:
        T = _t6_to_T(pose)
        world = objpoints @ T[:3, :3].T + T[:3, 3]
        uv = _project_np(world, ext_cam, K, np.zeros(5))
        H, _ = cv2.findHomography(can_corners, uv)
        view = cv2.warpPerspective(
            canonical, H, (w, h), flags=cv2.INTER_LINEAR, borderValue=170.0
        )
        view = cv2.GaussianBlur(view, (0, 0), 1.0)
        writer.write(view.astype(np.uint8))
        gts.append(uv)
    writer.release()
    return np.stack(gts)


@pytest.fixture(scope="module")
def video_rig(tmp_path_factory):
    """Two-camera synthetic rig rendered to real mp4 files."""
    board_shape = (5, 7)
    square_size = 12.5
    img_size = (640, 480)
    rng = np.random.default_rng(42)
    # Two cameras looking at the board volume from mild angles. Focal and
    # distance chosen so the lattice pitch is ~25 px in both views.
    K = np.array([[900.0, 0, 320], [0, 900.0, 240], [0, 0, 1]])
    ext0 = np.zeros(6)
    ext1 = np.concatenate([[0.0, 0.35, 0.0], [-160.0, 0.0, 40.0]])
    # Board poses: tilting + translating in front of the cameras (z ~ 450mm).
    poses = []
    for k in range(14):
        rot = np.array(
            [0.35 * np.sin(k), 0.35 * np.cos(1.3 * k), 0.2 * np.sin(2.1 * k)]
        )
        trans = np.array(
            [
                -50 + 12 * np.sin(0.9 * k),
                -40 + 12 * np.cos(1.7 * k),
                450 + 40 * np.sin(0.5 * k),
            ]
        )
        poses.append(np.concatenate([rot, trans]))
    poses = np.stack(poses)
    d = tmp_path_factory.mktemp("videos")
    paths = []
    for name, ext in [("camA", ext0), ("camB", ext1)]:
        p = str(d / f"{name}.mp4")
        _render_camera_video(
            p, K, ext, poses, board_shape, square_size, img_size
        )
        paths.append(p)
    return {
        "paths": paths,
        "K": K,
        "extrinsics": np.stack([ext0, ext1]),
        "poses": poses,
        "board_shape": board_shape,
        "square_size": square_size,
    }


class TestCLI:
    def test_detect_and_calibrate_end_to_end(self, video_rig, tmp_path, capsys):
        from multicam_calibration_tpu.cli import main

        out = str(tmp_path / "calib.json")
        rc = main(
            [
                "calibrate",
                *video_rig["paths"],
                "--output", out,
                "--board", "5", "7",
                "--square-size", "12.5",
            ]
        )
        assert rc == 0
        assert os.path.exists(out)
        data = json.load(open(out))
        assert set(data.keys()) == {"camA", "camB"}
        # Recovered relative camera geometry close to ground truth.
        ext_est, intr_est, names = mct.load_calibration(out, camera_names=["camA", "camB"])
        from multicam_calibration_tpu.synthetic import _t6_to_T, _T_to_t6

        rel_est = _T_to_t6(
            _t6_to_T(ext_est[1]) @ np.linalg.inv(_t6_to_T(ext_est[0]))
        )
        rel_true = _T_to_t6(
            _t6_to_T(video_rig["extrinsics"][1])
            @ np.linalg.inv(_t6_to_T(video_rig["extrinsics"][0]))
        )
        np.testing.assert_allclose(rel_est[:3], rel_true[:3], atol=0.02)
        assert np.linalg.norm(rel_est[3:] - rel_true[3:]) < 8.0
        # Focal length recovered within a few percent.
        assert abs(intr_est[0][0][0, 0] - 900) / 900 < 0.05

    def test_adjust_with_checkpoint(self, video_rig, tmp_path, capsys):
        from multicam_calibration_tpu.cli import main

        calib = str(tmp_path / "c.json")
        rc = main(
            [
                "calibrate", *video_rig["paths"], "--output", calib,
                "--board", "5", "7", "--square-size", "12.5",
            ]
        )
        assert rc == 0
        out = str(tmp_path / "adj.json")
        ck = str(tmp_path / "ba_state.npz")
        rc = main(
            [
                "adjust", *video_rig["paths"], "--calibration", calib,
                "--output", out, "--checkpoint", ck, "--uncertainty",
                "--board", "5", "7", "--square-size", "12.5",
            ]
        )
        assert rc == 0
        assert os.path.exists(out)
        assert os.path.exists(ck)
        saved = dict(np.load(ck))
        assert saved["it_done"] >= 1
        printed = capsys.readouterr().out
        assert "observation noise" in printed  # --uncertainty report

    def test_benchmark_command(self, capsys):
        from multicam_calibration_tpu.cli import main

        rc = main(
            ["benchmark", "--n-cameras", "2", "--n-frames", "20",
             "--max-iters", "3"]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["n_cameras"] == 2
        assert rec["n_iters"] >= 1
        assert rec["iters_per_s"] > 0

    def test_export_roundtrip(self, video_rig, tmp_path):
        from multicam_calibration_tpu.cli import main

        src = str(tmp_path / "c.json")
        mct.save_calibration(
            video_rig["extrinsics"],
            [(video_rig["K"], np.zeros(5))] * 2,
            ["camA", "camB"],
            src,
        )
        dst = str(tmp_path / "c.h5")
        rc = main(
            ["export", src, dst, "--from-format", "json", "--to-format", "gimbal"]
        )
        assert rc == 0
        ext2, intr2, names = mct.load_calibration(dst, load_format="gimbal")
        np.testing.assert_allclose(
            np.asarray(ext2), video_rig["extrinsics"], atol=1e-6
        )

    def test_flatibrate_command(self, tmp_path):
        import h5py

        from multicam_calibration_tpu.cli import main

        rng = np.random.default_rng(1)
        kp = rng.uniform(-100, 100, size=(200, 5, 3))
        kp[..., 2] = np.abs(kp[..., 2]) * 0.1 + 0.05 * kp[..., 0] + 12
        kp_path = str(tmp_path / "kp.h5")
        with h5py.File(kp_path, "w") as h5:
            h5.create_dataset("keypoints", data=kp)
        out = str(tmp_path / "flat.npy")
        rc = main(
            ["flatibrate", kp_path, "--output", out, "--center"]
        )
        assert rc == 0
        t = np.load(out)
        assert t.shape == (6,)


def test_build_version_matches_module(tmp_path):
    """Distribution builds bake the git-derived version (versioneer
    parity, reference setup.py:1-26): setup.py computes it from
    _version.py loaded as a file (no package import at build time)."""
    import importlib.util
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "setup.py", "--version"], cwd=repo,
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    built = out.stdout.strip().splitlines()[-1]
    spec = importlib.util.spec_from_file_location(
        "_v", os.path.join(repo, "multicam_calibration_tpu", "_version.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert built == mod.get_version()
