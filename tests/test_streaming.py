"""Rolling re-calibration (windowed streaming BA) tests."""
import numpy as np
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.models.streaming import RollingCalibrator
from multicam_calibration_tpu.synthetic import _t6_to_T, _T_to_t6


def relative_extrinsics(ext):
    T0_inv = np.linalg.inv(_t6_to_T(np.asarray(ext)[0]))
    return np.stack([_T_to_t6(_t6_to_T(e) @ T0_inv) for e in np.asarray(ext)])


@pytest.fixture(scope="module")
def stream_rig():
    return mct.make_synthetic_rig(
        n_cameras=4, n_frames=96, noise_px=0.3, dropout=0.15, seed=21
    )


def _noisy_start(rig, rng_seed=0):
    """Perturb the rig like mount drift: ~0.3 deg rotations, ~3 mm shifts."""
    rng = np.random.default_rng(rng_seed)
    ext = rig.all_extrinsics.copy()
    ext[:, :3] += rng.normal(0, 0.005, (len(ext), 3))
    ext[:, 3:] += rng.normal(0, 3.0, (len(ext), 3))
    ext[0] = rig.all_extrinsics[0]
    intr = [(K.copy(), d.copy()) for K, d in rig.all_intrinsics]
    return ext, intr


def test_streaming_converges_to_rig(stream_rig):
    rig = stream_rig
    ext0, intr0 = _noisy_start(rig)
    cal = RollingCalibrator(
        ext0, intr0, rig.calib_objpoints, window=64, iters_per_update=4
    )
    costs = []
    for lo in range(0, 96, 16):
        info = cal.update(rig.all_calib_uvs[:, lo : lo + 16])
        costs.append(info["cost"])
    assert cal.n_updates == 6
    assert cal.occupancy <= 64
    ext_est, intr_est = cal.calibration()
    rel_est = relative_extrinsics(ext_est)
    rel_true = relative_extrinsics(rig.all_extrinsics)
    rel_init = relative_extrinsics(ext0)
    err_est = np.linalg.norm(rel_est[:, 3:] - rel_true[:, 3:], axis=-1).max()
    err_init = np.linalg.norm(rel_init[:, 3:] - rel_true[:, 3:], axis=-1).max()
    assert err_est < err_init  # streaming refinement improved the cameras
    np.testing.assert_allclose(rel_est[:, :3], rel_true[:, :3], atol=0.02)


def test_streaming_window_eviction(stream_rig):
    rig = stream_rig
    cal = RollingCalibrator(
        rig.all_extrinsics, rig.all_intrinsics, rig.calib_objpoints,
        window=24, iters_per_update=2, protect_recent=8,
    )
    for lo in range(0, 96, 16):
        info = cal.update(rig.all_calib_uvs[:, lo : lo + 16])
        assert info["occupancy"] <= 24
    # Window saturated: most recent arrivals are present.
    assert cal.occupancy == 24
    assert cal._order.max() == cal._next_arrival - 1


def test_streaming_batch_larger_than_window(stream_rig):
    """A batch bigger than the window keeps its newest `window` frames and
    never writes two frames to one slot."""
    rig = stream_rig
    cal = RollingCalibrator(
        rig.all_extrinsics, rig.all_intrinsics, rig.calib_objpoints,
        window=12, iters_per_update=1, protect_recent=8,
    )
    info = cal.update(rig.all_calib_uvs[:, :48])
    assert info["admitted"] <= 12
    assert info["occupancy"] <= 12
    assert len(np.unique(cal._order[cal._order >= 0])) == cal.occupancy
    # Second oversized batch: eviction must produce distinct slots.
    info = cal.update(rig.all_calib_uvs[:, 48:96])
    assert info["occupancy"] <= 12
    orders = cal._order[cal._order >= 0]
    assert len(np.unique(orders)) == len(orders)


def test_streaming_tracks_drift(stream_rig):
    """Cameras drift mid-stream; the window tracks the new geometry."""
    rig = stream_rig
    cal = RollingCalibrator(
        rig.all_extrinsics, rig.all_intrinsics, rig.calib_objpoints,
        window=32, iters_per_update=6, protect_recent=16,
    )
    # Phase 1: nominal rig.
    for lo in range(0, 48, 16):
        cal.update(rig.all_calib_uvs[:, lo : lo + 16])
    # Phase 2: camera 2 physically shifts by 8 mm in x. Re-render its
    # observations by projecting the true board poses with the moved camera.
    from multicam_calibration_tpu.synthetic import _project_np

    ext_drift = rig.all_extrinsics.copy()
    ext_drift[2, 3] += 8.0
    uvs_drift = rig.all_calib_uvs.copy()
    rng = np.random.default_rng(5)
    for f in range(48, 96):
        if np.isnan(rig.all_calib_uvs[2, f]).any():
            continue
        T = _t6_to_T(rig.calib_poses[f])
        pts_w = rig.calib_objpoints @ T[:3, :3].T + T[:3, 3]
        K, d = rig.all_intrinsics[2]
        uvs_drift[2, f] = _project_np(pts_w, ext_drift[2], K, d) + rng.normal(
            0, 0.3, (len(rig.calib_objpoints), 2)
        )
    for lo in range(48, 96, 16):
        cal.update(uvs_drift[:, lo : lo + 16])
    ext_est, _ = cal.calibration()
    rel_est = relative_extrinsics(ext_est)
    rel_drift = relative_extrinsics(ext_drift)
    rel_orig = relative_extrinsics(rig.all_extrinsics)
    d_to_drifted = np.linalg.norm(rel_est[2, 3:] - rel_drift[2, 3:])
    d_to_original = np.linalg.norm(rel_est[2, 3:] - rel_orig[2, 3:])
    assert d_to_drifted < d_to_original  # tracked the move
