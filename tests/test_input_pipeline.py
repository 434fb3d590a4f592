"""Multi-host input-pipeline tests (single-process degenerate paths + the
shard-placement semantics on the 8-device virtual mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.parallel import (
    assign_videos_to_host,
    gather_detections,
    make_frame_mesh,
    shard_ba_inputs,
    sharded_lm_solve,
)
from multicam_calibration_tpu.models.bundle_adjustment import _params_to_arrays
from multicam_calibration_tpu.models.lm_core import LMOptions


def test_assignment_is_deterministic_and_complete():
    paths = [f"cam{i}.mp4" for i in range(7)]
    seen = []
    for host in range(3):
        mine, cams = assign_videos_to_host(paths, host, 3)
        assert [paths[c] for c in cams] == mine
        seen.extend(cams)
    assert sorted(seen) == list(range(7))
    # Re-running yields the identical assignment (no RNG, no comm).
    again, _ = assign_videos_to_host(paths, 1, 3)
    assert again == assign_videos_to_host(paths, 1, 3)[0]


def test_gather_detections_single_process():
    local = np.random.default_rng(0).random((2, 5, 4, 2))
    out = gather_detections(local, [0, 2], n_cameras=3, n_frames=5, n_points=4)
    np.testing.assert_array_equal(out[0], local[0])
    np.testing.assert_array_equal(out[2], local[1])
    assert np.isnan(out[1]).all()


def test_shard_ba_inputs_placement_and_solve():
    rig = mct.make_synthetic_rig(
        n_cameras=3, n_frames=21, noise_px=0.3, dropout=0.1, seed=4
    )
    full = ~np.isnan(rig.all_calib_uvs).any((-1, -2))
    use = np.nonzero(full.sum(0) > 1)[0]
    obs_np = np.nan_to_num(rig.all_calib_uvs[:, use])
    mask_np = ~np.isnan(rig.all_calib_uvs[:, use]).any(-1)
    poses_np = np.asarray(rig.calib_poses)[use]

    mesh = make_frame_mesh()
    obs, mask, poses, F = shard_ba_inputs(obs_np, mask_np, poses_np, mesh)
    assert F == len(use)
    assert poses.shape[0] % mesh.devices.size == 0
    # Placement: frame axis sharded, no replication of the big arrays.
    assert obs.sharding.spec == jax.sharding.PartitionSpec(None, "frames")
    # Padded frames must be inert: solve matches the unpadded local solve.
    cam0 = jnp.asarray(_params_to_arrays(rig.all_extrinsics, rig.all_intrinsics))
    opts = LMOptions(max_iters=5)
    cam_m, poses_m, info_m = sharded_lm_solve(
        cam0, poses, obs, mask, jnp.asarray(rig.calib_objpoints), opts,
        mesh=mesh,
    )
    from multicam_calibration_tpu.models.lm_core import lm_solve

    cam_s, poses_s, info_s = lm_solve(
        cam0, jnp.asarray(poses_np), jnp.asarray(obs_np),
        jnp.asarray(mask_np), jnp.asarray(rig.calib_objpoints), opts,
    )
    np.testing.assert_allclose(
        float(info_m["final_cost"]), float(info_s["final_cost"]), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(poses_m)[:F], np.asarray(poses_s), atol=1e-8
    )


def test_distributed_detection_single_process(tmp_path):
    from multicam_calibration_tpu.parallel import (
        distributed_calibration_detection,
    )
    from multicam_calibration_tpu.detection.native_video import (
        available,
        write_y4m,
    )

    if not available():
        pytest.skip("libmccvideo unavailable")
    from tests.test_native_video import _board_frames, BOARD

    frames, _ = _board_frames(3, seed0=60)
    paths = []
    for cam in range(2):
        p = str(tmp_path / f"d{cam}.y4m")
        write_y4m(p, frames)
        paths.append(p)
    uvs, img_sizes = distributed_calibration_detection(
        paths, mct.detect_chessboard, {"board_shape": BOARD}
    )
    assert uvs.shape[:2] == (2, 3)


def test_sharded_triangulate_matches_single_device():
    """Points-sharded triangulation == the single-device path, exactly the
    same outputs (no collectives: every stage is elementwise over points),
    including NaN semantics, with a point count that does NOT divide the
    8-device mesh (padding trim)."""
    from multicam_calibration_tpu.parallel import sharded_triangulate

    rng = np.random.default_rng(3)
    rig = mct.make_synthetic_rig(
        n_cameras=4, n_frames=10, noise_px=0.0, dropout=0.0, seed=3
    )
    pts = rng.standard_normal((203, 3)) * 30 + rig.calib_poses[:, 3:].mean(0)
    uvs = [
        np.asarray(
            mct.project_points(pts, rig.all_extrinsics[c], *rig.all_intrinsics[c])
        )
        + rng.standard_normal((203, 2)) * 0.3
        for c in range(4)
    ]
    uvs[1][:5] = np.nan
    uvs[2][3:6] = np.nan  # point 3,4: <=2 views on some, point 5 mixed
    exts = list(rig.all_extrinsics)
    intr = list(rig.all_intrinsics)

    mesh = make_frame_mesh(axis_name="points")
    single = np.asarray(mct.triangulate(uvs, exts, intr))
    shard = np.asarray(sharded_triangulate(uvs, exts, intr, mesh=mesh))
    assert shard.shape == (203, 3)
    np.testing.assert_allclose(shard, single, rtol=1e-10, atol=1e-10)

    s_ref, s_sd = mct.triangulate(uvs, exts, intr, return_sd=True)
    p_ref, p_sd = sharded_triangulate(uvs, exts, intr, mesh=mesh, return_sd=True)
    np.testing.assert_allclose(
        np.asarray(p_ref), np.asarray(s_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(p_sd), np.asarray(s_sd), rtol=1e-9, atol=1e-9
    )
