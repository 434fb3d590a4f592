"""Geometry-core unit tests against cv2/numpy closed-form oracles."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multicam_calibration_tpu as mct


def random_rotvecs(rng, n, scale=2.0):
    return rng.standard_normal((n, 3)) * scale


class TestRotation:
    def test_rodrigues_matches_cv2(self, rng):
        rvecs = random_rotvecs(rng, 50)
        ours = np.asarray(mct.rodrigues(jnp.asarray(rvecs)))
        for r, R in zip(rvecs, ours):
            R_cv, _ = cv2.Rodrigues(r)
            np.testing.assert_allclose(R, R_cv, atol=1e-10)

    def test_rodrigues_zero(self):
        R = np.asarray(mct.rodrigues(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_rodrigues_roundtrip(self, rng):
        # log(exp(r)) == r only on the canonical branch (|r| < pi).
        dirs = rng.standard_normal((100, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rvecs = dirs * rng.uniform(0, 3.0, size=(100, 1))
        rec = np.asarray(mct.rodrigues_inv(mct.rodrigues(jnp.asarray(rvecs))))
        np.testing.assert_allclose(rec, rvecs, atol=1e-8)

    def test_rodrigues_grad_at_zero_is_finite(self):
        J = jax.jacobian(lambda r: mct.rodrigues(r))(jnp.zeros(3))
        assert np.all(np.isfinite(J))
        # dR/dr at r=0 is the generator basis: dR/dr_k = skew(e_k)
        expected = np.stack(
            [np.asarray(mct.skew(jnp.eye(3)[k])) for k in range(3)], axis=-1
        )
        np.testing.assert_allclose(np.asarray(J), expected, atol=1e-6)

    def test_batched_shapes(self, rng):
        r = rng.standard_normal((4, 5, 3))
        R = mct.rodrigues(jnp.asarray(r))
        assert R.shape == (4, 5, 3, 3)
        assert mct.rodrigues_inv(R).shape == (4, 5, 3)


class TestTransforms:
    def test_matrix_vector_roundtrip(self, rng):
        t = rng.standard_normal((20, 6))
        T = mct.get_transformation_matrix(jnp.asarray(t))
        assert T.shape == (20, 4, 4)
        np.testing.assert_allclose(
            np.asarray(mct.get_transformation_vector(T)), t, atol=1e-8
        )

    def test_se3_inverse(self, rng):
        t = rng.standard_normal((10, 6))
        T = np.asarray(mct.get_transformation_matrix(jnp.asarray(t)))
        Tinv = np.asarray(mct.se3_inverse(jnp.asarray(T)))
        for a, b in zip(T, Tinv):
            np.testing.assert_allclose(a @ b, np.eye(4), atol=1e-10)

    def test_apply_rigid_transform_matches_matrix(self, rng):
        t = rng.standard_normal(6)
        pts = rng.standard_normal((7, 3))
        T = np.asarray(mct.get_transformation_matrix(jnp.asarray(t)))
        expected = (T[:3, :3] @ pts.T).T + T[:3, 3]
        np.testing.assert_allclose(
            np.asarray(mct.apply_rigid_transform(jnp.asarray(t), jnp.asarray(pts))),
            expected,
            atol=1e-10,
        )

    def test_kabsch_recovers_transform(self, rng):
        t_true = rng.standard_normal(6)
        src = rng.standard_normal((30, 3))
        dst = np.asarray(
            mct.apply_rigid_transform(jnp.asarray(t_true), jnp.asarray(src))
        )
        t_est, rmsd = mct.rigid_transform_from_correspondences(
            jnp.asarray(src), jnp.asarray(dst)
        )
        np.testing.assert_allclose(np.asarray(t_est), t_true, atol=1e-8)
        assert float(rmsd) < 1e-9

    def test_kabsch_reflection_fix(self, rng):
        # Nearly-planar sets tempt the SVD into a reflection; det must be +1.
        src = rng.standard_normal((10, 3))
        src[:, 2] *= 1e-9
        dst = -src[:, [1, 0, 2]]
        t_est, _ = mct.rigid_transform_from_correspondences(
            jnp.asarray(src), jnp.asarray(dst)
        )
        R = np.asarray(mct.rodrigues(t_est[:3]))
        assert np.linalg.det(R) > 0.99

    def test_homogeneous_roundtrip(self, rng):
        x = rng.standard_normal((5, 3))
        h = mct.euclidean_to_homogenous(jnp.asarray(x))
        assert h.shape == (5, 4)
        np.testing.assert_allclose(
            np.asarray(mct.homogeneous_to_euclidean(h)), x, atol=1e-12
        )


def make_camera(rng, img_size=(640, 480)):
    K = np.array(
        [
            [500 + rng.uniform(-20, 20), 0, img_size[0] / 2 + rng.uniform(-5, 5)],
            [0, 500 + rng.uniform(-20, 20), img_size[1] / 2 + rng.uniform(-5, 5)],
            [0, 0, 1.0],
        ]
    )
    dist = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.05, 0.05), 0, 0, 0])
    return K, dist


class TestProjection:
    def test_project_matches_cv2(self, rng):
        K, dist = make_camera(rng)
        ext = np.concatenate([rng.standard_normal(3) * 0.3, [0.1, -0.2, 0.5]])
        pts = rng.standard_normal((40, 3)) * 0.3 + np.array([0, 0, 3.0])
        ours = np.asarray(
            mct.project_points(jnp.asarray(pts), jnp.asarray(ext), jnp.asarray(K), jnp.asarray(dist))
        )
        expected, _ = cv2.projectPoints(pts, ext[:3], ext[3:], K, dist)
        np.testing.assert_allclose(ours, expected.squeeze(1), atol=1e-8)

    def test_project_full_5coef_matches_cv2(self, rng):
        K, _ = make_camera(rng)
        dist = np.array([-0.1, 0.03, 0.002, -0.001, 0.005])
        ext = np.concatenate([rng.standard_normal(3) * 0.2, [0, 0, 0.3]])
        pts = rng.standard_normal((25, 3)) * 0.3 + np.array([0, 0, 2.0])
        ours = np.asarray(
            mct.project_points(jnp.asarray(pts), jnp.asarray(ext), jnp.asarray(K), jnp.asarray(dist))
        )
        expected, _ = cv2.projectPoints(pts, ext[:3], ext[3:], K, dist)
        np.testing.assert_allclose(ours, expected.squeeze(1), atol=1e-8)

    def test_undistort_roundtrip(self, rng):
        K, dist = make_camera(rng)
        uv = rng.uniform([100, 100], [540, 380], size=(50, 2))
        distorted = np.asarray(mct.distort_points(jnp.asarray(uv), jnp.asarray(K), jnp.asarray(dist)))
        rec = np.asarray(mct.undistort_points(jnp.asarray(distorted), jnp.asarray(K), jnp.asarray(dist)))
        np.testing.assert_allclose(rec, uv, atol=1e-6)

    def test_undistort_matches_cv2(self, rng):
        K, dist = make_camera(rng)
        uv = rng.uniform([50, 50], [590, 430], size=(30, 2))
        ours = np.asarray(mct.undistort_points(jnp.asarray(uv), jnp.asarray(K), jnp.asarray(dist)))
        expected = cv2.undistortPoints(uv, K, dist, None, K).squeeze(1)
        np.testing.assert_allclose(ours, expected, atol=1e-3)

    def test_undistort_nan_transparent(self, rng):
        K, dist = make_camera(rng)
        uv = np.array([[100.0, 100.0], [np.nan, 200.0]])
        out = np.asarray(mct.undistort_points(jnp.asarray(uv), jnp.asarray(K), jnp.asarray(dist)))
        assert np.all(np.isfinite(out[0]))
        assert np.all(np.isnan(out[1]))


class TestHomography:
    def test_fit_recovers_exact(self, rng):
        H_true = np.eye(3) + rng.standard_normal((3, 3)) * 0.1
        H_true /= H_true[2, 2]
        src = rng.uniform(-1, 1, size=(20, 2)) * 10
        dst = np.asarray(mct.apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
        H_est = np.asarray(mct.fit_homography(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(H_est, H_true, atol=1e-8)

    def test_matches_cv2_findhomography(self, rng):
        src = np.mgrid[0:5, 0:7].reshape(2, -1).T.astype(float)
        H_true = np.array([[1.1, 0.05, 3], [-0.04, 0.9, 5], [0.001, -0.002, 1.0]])
        dst = np.asarray(mct.apply_homography(jnp.asarray(H_true), jnp.asarray(src)))
        H_cv, _ = cv2.findHomography(src, dst)
        H_est = np.asarray(mct.fit_homography(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(H_est, H_cv, atol=1e-6)

    def test_four_point(self, rng):
        src = np.array([[0, 0], [40, 0], [40, 40], [0, 40]], dtype=float)
        dst = src + rng.uniform(-5, 5, size=(4, 2))
        M_cv = cv2.getPerspectiveTransform(src.astype(np.float32), dst.astype(np.float32))
        M = np.asarray(mct.get_perspective_transform(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(M, M_cv, atol=1e-4)

    def test_warp_matches_cv2(self, rng):
        img = rng.uniform(0, 255, size=(60, 80)).astype(np.float64)
        H = np.array([[1.02, 0.01, 2.0], [-0.02, 0.97, 1.5], [1e-4, -1e-4, 1.0]])
        ours = np.asarray(mct.warp_perspective(jnp.asarray(img), jnp.asarray(H), (40, 50)))
        # cv2 quantizes bilinear weights to 5 bits (INTER_BITS), so it only
        # agrees loosely; exact check is against the float oracle below.
        expected = cv2.warpPerspective(img, H, (50, 40), flags=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours[2:-2, 2:-2], expected[2:-2, 2:-2], atol=8)

        # Exact float bilinear oracle.
        Hinv = np.linalg.inv(H)
        oracle = np.zeros((40, 50))
        for yo in range(40):
            for xo in range(50):
                p = Hinv @ np.array([xo, yo, 1.0])
                x, y = p[0] / p[2], p[1] / p[2]
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                wx, wy = x - x0, y - y0
                acc = 0.0
                for dy, wyy in ((0, 1 - wy), (1, wy)):
                    for dx, wxx in ((0, 1 - wx), (1, wx)):
                        yi, xi = y0 + dy, x0 + dx
                        v = img[yi, xi] if (0 <= yi < 60 and 0 <= xi < 80) else 0.0
                        acc += v * wyy * wxx
                oracle[yo, xo] = acc
        np.testing.assert_allclose(ours, oracle, atol=1e-9)


class TestTriangulation:
    def _rig(self, rng, n_cameras=4):
        cams = []
        for i in range(n_cameras):
            K, dist = make_camera(rng)
            ext = np.concatenate(
                [rng.standard_normal(3) * 0.2, rng.standard_normal(3) * 0.3]
            )
            cams.append((ext, K, dist))
        return cams

    def test_triangulate_recovers_points(self, rng):
        cams = self._rig(rng)
        pts = rng.standard_normal((25, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = [
            np.asarray(
                mct.project_points(jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d))
            )
            for e, K, d in cams
        ]
        rec = np.asarray(
            mct.triangulate(
                all_uvs,
                [e for e, _, _ in cams],
                [(K, d) for _, K, d in cams],
            )
        )
        np.testing.assert_allclose(rec, pts, atol=1e-5)

    def test_triangulate_with_missing_observations(self, rng):
        cams = self._rig(rng, n_cameras=3)
        pts = rng.standard_normal((10, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = [
            np.array(
                mct.project_points(jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d))
            )
            for e, K, d in cams
        ]
        # Point 0: only seen by camera 0 -> NaN result. Point 1: cams 0,1 only.
        all_uvs[1][0] = np.nan
        all_uvs[2][0] = np.nan
        all_uvs[2][1] = np.nan
        rec = np.asarray(
            mct.triangulate(
                all_uvs,
                [e for e, _, _ in cams],
                [(K, d) for _, K, d in cams],
            )
        )
        assert np.all(np.isnan(rec[0]))
        np.testing.assert_allclose(rec[1], pts[1], atol=1e-5)
        np.testing.assert_allclose(rec[2:], pts[2:], atol=1e-5)

    def test_refine_improves_noisy_cloud(self, rng):
        cams = self._rig(rng, n_cameras=5)
        pts = rng.standard_normal((400, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = []
        for e, K, d in cams:
            uv = np.array(
                mct.project_points(
                    jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d)
                )
            )
            uv += rng.standard_normal(uv.shape) * 0.5
            all_uvs.append(uv)
        exts = [e for e, _, _ in cams]
        intr = [(K, d) for _, K, d in cams]
        med = np.asarray(mct.triangulate(all_uvs, exts, intr, refine=False))
        ref, sd = mct.triangulate(all_uvs, exts, intr, return_sd=True)
        ref, sd = np.asarray(ref), np.asarray(sd)
        rmse_med = np.sqrt(np.nanmean(np.sum((med - pts) ** 2, -1)))
        rmse_ref = np.sqrt(np.nanmean(np.sum((ref - pts) ** 2, -1)))
        # The all-view GN polish is statistically efficient where the
        # pair-median is merely robust.
        assert rmse_ref < rmse_med
        # sd is calibrated: median standardized chi2 within 2x of chi2(3).
        z2 = np.sum(((ref - pts) / sd) ** 2, -1)
        assert 1.0 < np.median(z2) < 5.0

    def test_refine_rejects_outlier_view(self, rng):
        # One bad camera of 6 corrupts 5/15 pairs — below the pair-median's
        # 50% breakdown (at 4 cameras it would be 3/6 = AT breakdown, where
        # the median itself fails — same as the reference).
        cams = self._rig(rng, n_cameras=6)
        pts = rng.standard_normal((30, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = [
            np.array(
                mct.project_points(
                    jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d)
                )
            )
            for e, K, d in cams
        ]
        all_uvs[2][:10] += 80.0  # gross outlier detections in one camera
        exts = [e for e, _, _ in cams]
        intr = [(K, d) for _, K, d in cams]
        ref = np.asarray(mct.triangulate(all_uvs, exts, intr, refine=True))
        np.testing.assert_allclose(ref, pts, atol=1e-4)

    def test_refine_preserves_nan_semantics(self, rng):
        cams = self._rig(rng, n_cameras=3)
        pts = rng.standard_normal((6, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = [
            np.array(
                mct.project_points(
                    jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d)
                )
            )
            for e, K, d in cams
        ]
        all_uvs[1][0] = np.nan
        all_uvs[2][0] = np.nan  # point 0: single view -> NaN out
        exts = [e for e, _, _ in cams]
        intr = [(K, d) for _, K, d in cams]
        ref, sd = mct.triangulate(all_uvs, exts, intr, return_sd=True)
        ref, sd = np.asarray(ref), np.asarray(sd)
        assert np.all(np.isnan(ref[0])) and np.all(np.isnan(sd[0]))
        np.testing.assert_allclose(ref[1:], pts[1:], atol=1e-4)

    def test_matches_reference_median_semantics(self, rng):
        # With noisy observations ours should match the reference's
        # nanmedian-over-pairs (numpy implementation) closely.
        cams = self._rig(rng, n_cameras=4)
        pts = rng.standard_normal((15, 3)) * 0.5 + np.array([0, 0, 4.0])
        all_uvs = []
        for e, K, d in cams:
            uv = np.array(
                mct.project_points(jnp.asarray(pts), jnp.asarray(e), jnp.asarray(K), jnp.asarray(d))
            )
            uv += rng.standard_normal(uv.shape) * 0.5
            all_uvs.append(uv)
        rec = np.asarray(
            mct.triangulate(
                all_uvs,
                [e for e, _, _ in cams],
                [(K, d) for _, K, d in cams],
                refine=False,  # the reference's median-over-pairs semantics
            )
        )
        err = np.linalg.norm(rec - pts, axis=-1)
        assert np.median(err) < 0.05


class TestReductions:
    def test_masked_median_matches_nanmedian(self, rng):
        x = rng.standard_normal((6, 11))
        x[rng.uniform(size=x.shape) < 0.3] = np.nan
        ours = np.asarray(mct.nanmedian(jnp.asarray(x), axis=-1))
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                expected = np.nanmedian(x, axis=-1)
        np.testing.assert_allclose(ours, expected, atol=1e-12, equal_nan=True)

    def test_masked_median_all_invalid(self):
        out = np.asarray(
            mct.masked_median(jnp.zeros((3, 4)), jnp.zeros((3, 4), bool), axis=-1)
        )
        assert np.all(np.isnan(out))

    def test_masked_median_under_jit(self, rng):
        x = rng.standard_normal((5, 9))
        m = rng.uniform(size=x.shape) > 0.4
        f = jax.jit(lambda v, k: mct.masked_median(v, k, axis=-1))
        ours = np.asarray(f(jnp.asarray(x), jnp.asarray(m)))
        expected = np.array(
            [np.median(row[mk]) if mk.any() else np.nan for row, mk in zip(x, m)]
        )
        np.testing.assert_allclose(ours, expected, atol=1e-12, equal_nan=True)
