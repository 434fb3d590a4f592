"""Execute the README quickstart verbatim (VERDICT r1: the documented flow
had never been run and contained a crash). The code block is extracted from
README.md and exec'd against a synthetic rig — detection is stubbed (its
real path is covered by test_detection / test_e2e_distortion); everything
downstream (calibrate, bundle_adjust, plot_residuals, save_calibration,
triangulate, flatibration) runs for real, so any API drift in the docs
breaks this test.
"""
import os
import re

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _quickstart_block():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(
        r"## Quickstart.*?```python\n(.*?)```", text, flags=re.DOTALL
    )
    assert m, "README quickstart python block not found"
    return m.group(1)


def test_readme_quickstart_executes(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import multicam_calibration_tpu as mct

    code = _quickstart_block()
    # x64 is already on (conftest); the snippet's own call is a no-op.

    rig = mct.make_synthetic_rig(
        n_cameras=3, n_frames=60, noise_px=0.3, dropout=0.2, seed=3
    )

    # Stub the detection stage: the quickstart names video files on disk;
    # supply the synthetic rig's detections for those paths instead.
    def fake_detection(video_paths, detection_fun, options, **kwargs):
        assert detection_fun is mct.detect_chessboard
        assert options == {"board_shape": (5, 7)}
        return rig.all_calib_uvs, rig.img_sizes

    monkeypatch.setattr(mct, "run_calibration_detection", fake_detection)

    # 3D keypoints for the triangulate step: the board corners embedded in
    # world coordinates over 20 frames, projected by the TRUE cameras —
    # (C, T, K, 2) like real tracked keypoints.
    from multicam_calibration_tpu.synthetic import _project_np

    world_pts = np.asarray(
        mct.embed_calib_objpoints(
            rig.calib_objpoints, np.nan_to_num(rig.calib_poses[:20])
        )
    )  # (T, K, 3)
    keypoint_uvs = np.stack(
        [
            _project_np(
                world_pts.reshape(-1, 3),
                rig.all_extrinsics[c],
                *rig.all_intrinsics[c],
            )
            for c in range(3)
        ]
    )  # (C, T*K, 2) — the shape the quickstart documents

    ns = {"keypoint_uvs": keypoint_uvs, "n_keypoints": world_pts.shape[1]}
    cwd = os.getcwd()
    os.chdir(tmp_path)  # the snippet writes calib.json
    try:
        exec(compile(code, "README-quickstart", "exec"), ns)
    finally:
        os.chdir(cwd)

    # The documented flow must actually produce a working calibration.
    assert os.path.exists(tmp_path / "calib.json")
    med = float(np.asarray(ns["med_err"]).max())
    assert med < 1.0, f"documented flow median error {med}"
    pts3d = np.asarray(ns["points3d"]).reshape(world_pts.shape)
    # Triangulated keypoints match the true world points up to the global
    # gauge (the adjusted rig's world frame is arbitrary): rigid-align, then
    # require sub-mm residual.
    ok = np.isfinite(pts3d).all(-1)
    _, rmsd = mct.rigid_transform_from_correspondences(
        pts3d[ok], world_pts[ok]
    )
    assert float(rmsd) < 1.0, f"gauge-aligned triangulation RMSD {rmsd}"
    assert np.asarray(ns["transform"]).shape == (6,)
