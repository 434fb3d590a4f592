"""calibration_uncertainty: Schur-marginal covariance vs a dense oracle.

The decisive test is exact: the block/Schur covariance must equal the dense
(J^T W J)^{-1} computed by materializing the full Jacobian on a tiny
problem. Scale/semantics tests (gauge zeros, noise recovery, 1/sqrt(F)
shrinkage) guard the user-facing numbers.
"""
import numpy as np
import jax
import jax.numpy as jnp

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.models.bundle_adjustment import _params_to_arrays
from multicam_calibration_tpu.models.lm_core import (
    LMOptions,
    _robust_weights,
    compute_residuals,
)
from multicam_calibration_tpu.models.uncertainty import (
    _free_mask,
    _uncertainty_impl,
    calibration_uncertainty,
)


def _tiny_problem(n_cameras=2, n_frames=8, seed=5):
    rig = mct.make_synthetic_rig(
        n_cameras=n_cameras, n_frames=n_frames, noise_px=0.3, dropout=0.0,
        seed=seed,
    )
    uvs = np.asarray(rig.all_calib_uvs)
    cam = jnp.asarray(_params_to_arrays(rig.all_extrinsics, rig.all_intrinsics))
    poses = jnp.asarray(rig.calib_poses)
    obs = jnp.asarray(np.nan_to_num(uvs))
    mask = jnp.asarray(~np.isnan(uvs).any(-1))
    obj = jnp.asarray(rig.calib_objpoints)
    return rig, uvs, cam, poses, obs, mask, obj


class TestDenseOracle:
    def test_matches_dense_covariance(self):
        _, _, cam, poses, obs, mask, obj = _tiny_problem()
        C, F = cam.shape[0], poses.shape[0]
        opts = LMOptions(loss="soft_l1", f_scale=1.0)

        # Frozen IRLS weights (the GN covariance convention: W evaluated at
        # the linearization point, not differentiated through).
        r0 = compute_residuals(cam, poses, obs, mask, obj)
        r2 = jnp.where(mask[..., None], r0**2, 0.0)
        w0 = jnp.where(mask[..., None], _robust_weights(r2, opts), 0.0)

        def resid_vec(theta):
            camv = theta[: 12 * C].reshape(C, 12)
            posv = theta[12 * C :].reshape(F, 6)
            return (w0 * compute_residuals(camv, posv, obs, mask, obj)).reshape(-1)

        theta0 = jnp.concatenate([cam.reshape(-1), poses.reshape(-1)])
        J = np.asarray(jax.jacfwd(resid_vec)(theta0))
        free = np.ones(12 * C + 6 * F, bool)
        free[6:12] = False  # root camera extrinsics = gauge
        cov = np.linalg.inv(J[:, free].T @ J[:, free])
        dense_var = np.zeros(12 * C + 6 * F)
        dense_var[free] = np.diag(cov)
        dense_cam = dense_var[: 12 * C].reshape(C, 12)
        dense_pose = dense_var[12 * C :].reshape(F, 6)

        cam_var, pose_var, _, _, _ = _uncertainty_impl(
            cam, poses, obs, mask, obj, _free_mask(C, 0, cam.dtype)
        )
        np.testing.assert_allclose(np.asarray(cam_var), dense_cam, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(pose_var), dense_pose, rtol=1e-5)


class TestSemantics:
    def test_gauge_and_noise_scale(self):
        rig, uvs, *_ = _tiny_problem(n_cameras=3, n_frames=40, seed=9)
        aext, aintr, aposes, use, _ = mct.bundle_adjust(
            uvs,
            rig.all_extrinsics,
            [list(i) for i in rig.all_intrinsics],
            rig.calib_objpoints,
            rig.calib_poses,
            verbose=False,
        )
        unc = mct.calibration_uncertainty(
            uvs[:, use], aext, aintr, rig.calib_objpoints, aposes
        )
        # Root camera extrinsics define the gauge: exactly zero sd.
        assert np.all(unc["camera_sd"][0, 6:] == 0)
        # Every free parameter has a strictly positive finite sd.
        free_sd = np.concatenate(
            [unc["camera_sd"][:, :6].ravel(), unc["camera_sd"][1:, 6:].ravel()]
        )
        assert np.all(free_sd > 0) and np.all(np.isfinite(free_sd))
        # Estimated observation noise recovers the injected 0.3 px within
        # the soft-L1 downweighting slack.
        assert 0.15 < unc["sigma_px"] < 0.45
        assert np.all(np.isfinite(unc["pose_sd"]))

    def test_sd_shrinks_with_more_frames(self):
        """Quadrupling the frames should roughly halve parameter sd."""
        sds = []
        for n_frames in (20, 80):
            rig = mct.make_synthetic_rig(
                n_cameras=3, n_frames=n_frames, noise_px=0.3, dropout=0.0,
                seed=11,
            )
            uvs = np.asarray(rig.all_calib_uvs)
            unc = mct.calibration_uncertainty(
                uvs,
                rig.all_extrinsics,
                rig.all_intrinsics,
                rig.calib_objpoints,
                rig.calib_poses,
            )
            sds.append(unc["camera_sd"][:, 0].mean())  # mean fx sd
        ratio = sds[0] / sds[1]
        assert 1.4 < ratio < 3.0  # ~2 expected; geometry varies per frame set
