"""64-camera volumetric-stage config (BASELINE.json config 5), frame-sharded
over the 8-device virtual mesh. Validates the distributed Schur path at the
largest rig scale: the reduced camera system is (12*64)^2 = 768^2, psum'd
once per LM iteration."""
import numpy as np
import jax.numpy as jnp
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.models.bundle_adjustment import _params_to_arrays
from multicam_calibration_tpu.models.lm_core import LMOptions, lm_solve
from multicam_calibration_tpu.parallel import make_frame_mesh, sharded_lm_solve


@pytest.fixture(scope="module")
def big_rig():
    return mct.make_synthetic_rig(
        n_cameras=64, n_frames=48, noise_px=0.3, dropout=0.2, seed=9
    )


def test_64cam_sharded_matches_single_device(big_rig):
    rig = big_rig
    full = ~np.isnan(rig.all_calib_uvs).any((-1, -2))
    use = np.nonzero(full.sum(0) > 1)[0]
    obs_np = rig.all_calib_uvs[:, use]
    mask = jnp.asarray(~np.isnan(obs_np).any(-1))
    obs = jnp.asarray(np.nan_to_num(obs_np))
    # Perturbed ground truth as the start: isolates the solver (the init
    # pipeline is covered elsewhere; at 64 cams it would dominate test time).
    rng = np.random.default_rng(1)
    ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
    cam0 = jnp.asarray(_params_to_arrays(ext, rig.all_intrinsics))
    poses0 = jnp.asarray(np.asarray(rig.calib_poses)[use])
    objp = jnp.asarray(rig.calib_objpoints)
    opts = LMOptions(max_iters=8)

    cam_s, poses_s, info_s = lm_solve(cam0, poses0, obs, mask, objp, opts)
    mesh = make_frame_mesh()
    assert mesh.devices.size == 8
    cam_m, poses_m, info_m = sharded_lm_solve(
        cam0, poses0, obs, mask, objp, opts, mesh=mesh
    )
    assert cam_m.shape == (64, 12)
    # Same optimization on 8 shards as on one device.
    np.testing.assert_allclose(
        float(info_m["final_cost"]), float(info_s["final_cost"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cam_m), np.asarray(cam_s), atol=1e-6
    )
    assert float(info_m["final_cost"]) < float(info_m["initial_cost"])


def test_64cam_chunked_sharded_runs_at_depth(big_rig):
    """Config-5-shaped path: 64 cams, deep frame axis, frame_chunk bounding
    memory, sharded over the 8-device mesh. Validates the chunked scan +
    psum pipeline executes and descends at a frame count where the dense
    path's (C, F, N, 2, 18) jacfwd transients would be prohibitive."""
    rig = mct.make_synthetic_rig(
        n_cameras=64, n_frames=768, noise_px=0.3, dropout=0.2, seed=9
    )
    full = ~np.isnan(rig.all_calib_uvs).any((-1, -2))
    use = np.nonzero(full.sum(0) > 1)[0]
    obs_np = rig.all_calib_uvs[:, use]
    rng = np.random.default_rng(1)
    ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
    cam0 = jnp.asarray(_params_to_arrays(ext, rig.all_intrinsics))
    poses0 = jnp.asarray(np.asarray(rig.calib_poses)[use])
    mesh = make_frame_mesh()
    # chunk=32 over ~96 local frames/device -> 3 scan slabs per device.
    cam, poses, info = sharded_lm_solve(
        cam0, poses0, jnp.asarray(np.nan_to_num(obs_np)),
        jnp.asarray(~np.isnan(obs_np).any(-1)),
        jnp.asarray(rig.calib_objpoints),
        LMOptions(max_iters=3, frame_chunk=32), mesh=mesh,
    )
    assert poses.shape == (len(use), 6)
    assert float(info["final_cost"]) < 0.5 * float(info["initial_cost"])


def test_64cam_quality(big_rig):
    rig = big_rig
    full = ~np.isnan(rig.all_calib_uvs).any((-1, -2))
    use = np.nonzero(full.sum(0) > 1)[0]
    obs_np = rig.all_calib_uvs[:, use]
    mask_np = ~np.isnan(obs_np).any(-1)
    rng = np.random.default_rng(1)
    ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
    cam0 = jnp.asarray(_params_to_arrays(ext, rig.all_intrinsics))
    poses0 = jnp.asarray(np.asarray(rig.calib_poses)[use])
    objp = jnp.asarray(rig.calib_objpoints)
    mesh = make_frame_mesh()
    cam, poses, info = sharded_lm_solve(
        cam0, poses0, jnp.asarray(np.nan_to_num(obs_np)),
        jnp.asarray(mask_np), objp, LMOptions(), mesh=mesh,
    )
    ext2, intr2 = (np.asarray(cam)[:, 6:12], None)
    intr_out = [
        (
            np.array([[c[0], 0, c[2]], [0, c[1], c[3]], [0, 0, 1.0]]),
            np.array([c[4], c[5], 0, 0, 0]),
        )
        for c in np.asarray(cam)
    ]
    pred = np.asarray(
        mct.predict_calib_uvs(ext2, intr_out, rig.calib_objpoints,
                              np.asarray(poses))
    )
    err = np.linalg.norm(obs_np - pred, axis=-1)
    rmse = np.sqrt(np.nanmean(np.where(mask_np, err, np.nan) ** 2))
    assert rmse < 0.5  # noise floor ~0.42 px at 0.3 px/axis
