"""I/O round-trips (3 formats), flatibration, and the residual QC metric."""
import os

import numpy as np
import pytest

import multicam_calibration_tpu as mct


@pytest.fixture(scope="module")
def calib(rng_module):
    rng = rng_module
    n = 4
    ext = rng.standard_normal((n, 6))
    intr = []
    for _ in range(n):
        K = np.array(
            [[900 + rng.uniform(-5, 5), 0, 640], [0, 900, 512], [0, 0, 1.0]]
        )
        dist = np.array([rng.uniform(-0.2, 0), rng.uniform(0, 0.05), 0, 0, 0])
        intr.append((K, dist))
    names = [f"cam{i}" for i in range(n)]
    return ext, intr, names


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(5)


class TestIO:
    @pytest.mark.parametrize("fmt", ["json", "jarvis", "gimbal"])
    def test_roundtrip(self, calib, fmt, tmp_path_factory):
        ext, intr, names = calib
        path = str(tmp_path_factory.mktemp(fmt) / f"calib_{fmt}")
        mct.save_calibration(ext, intr, names, path, save_format=fmt)
        ext2, intr2, names2 = mct.load_calibration(
            path if fmt == "jarvis" else path + (".json" if fmt == "json" else ".h5"),
            load_format=fmt,
        )
        assert names2 == names
        for i in range(len(names)):
            np.testing.assert_allclose(ext2[i], ext[i], atol=1e-6)
            np.testing.assert_allclose(intr2[i][0], intr[i][0], atol=1e-6)
            np.testing.assert_allclose(intr2[i][1], intr[i][1], atol=1e-6)

    def test_camera_subset_ordering(self, calib, tmp_path_factory):
        ext, intr, names = calib
        path = str(tmp_path_factory.mktemp("subset") / "calib")
        mct.save_calibration(ext, intr, names, path, save_format="gimbal")
        sub = [names[2], names[0]]
        ext2, intr2, names2 = mct.load_calibration(
            path + ".h5", load_format="gimbal", camera_names=sub
        )
        assert names2 == sub
        np.testing.assert_allclose(ext2[0], ext[2], atol=1e-6)
        np.testing.assert_allclose(ext2[1], ext[0], atol=1e-6)

    def test_json_readable_by_reference_loader_keys(self, calib, tmp_path_factory):
        # We write both R/T and rotation/translation keys; the reference's
        # own json loader reads rotation/translation (io.py:161-166).
        import json

        ext, intr, names = calib
        path = str(tmp_path_factory.mktemp("refkeys") / "calib.json")
        mct.save_calibration(ext, intr, names, path, save_format="json")
        data = json.load(open(path))
        for name in names:
            assert "rotation" in data[name] and "R" in data[name]
            np.testing.assert_allclose(
                data[name]["rotation"], data[name]["R"]
            )


class TestFlatibration:
    def test_recovers_tilted_floor(self, rng_module):
        rng = rng_module
        # Floor points on plane z = 0.1 x - 0.2 y + 30, with outliers.
        n = 400
        xy = rng.uniform(-300, 300, size=(n, 2))
        z = 0.1 * xy[:, 0] - 0.2 * xy[:, 1] + 30 + rng.standard_normal(n) * 1.0
        pts = np.column_stack([xy, z])
        out_ix = rng.choice(n, 40, replace=False)
        pts[out_ix, 2] += rng.uniform(50, 200, size=40)  # animal body points

        transform = mct.flatibrate(pts, residual_threshold=10)
        import jax.numpy as jnp

        flat = np.asarray(
            mct.apply_rigid_transform(jnp.asarray(transform), jnp.asarray(pts))
        )
        inliers = np.setdiff1d(np.arange(n), out_ix)
        # Inlier floor points should now lie at z ~ 0.
        assert np.abs(np.median(flat[inliers, 2])) < 1.0
        assert np.percentile(np.abs(flat[inliers, 2]), 90) < 3.0

    def test_get_floor_points(self, rng_module):
        kp = rng_module.standard_normal((50, 8, 3))
        fp = mct.get_floor_points(kp)
        assert fp.shape == (50, 3)
        np.testing.assert_allclose(fp[:, 2], kp[:, :, 2].min(1))
        fp_down = mct.get_floor_points(kp, z_points_down=True)
        np.testing.assert_allclose(fp_down[:, 2], kp[:, :, 2].max(1))

    def test_flip_z(self):
        t = np.zeros(6)
        flipped = mct.flip_z_axis(t)
        import jax.numpy as jnp

        pts = np.array([[1.0, 2.0, 3.0]])
        out = np.asarray(
            mct.apply_rigid_transform(jnp.asarray(flipped), jnp.asarray(pts))
        )
        np.testing.assert_allclose(out, [[1.0, -2.0, -3.0]], atol=1e-10)

    def test_center_arena(self, rng_module):
        import jax.numpy as jnp

        pts = rng_module.uniform(-100, 100, size=(200, 3))
        pts[:, 2] = 0
        shifted = pts + np.array([50, -30, 0])

        # mean centering: the mean of the moved points lands at the origin
        t = mct.center_arena(np.zeros(6), shifted, center_method="mean")
        moved = np.asarray(
            mct.apply_rigid_transform(jnp.asarray(t), jnp.asarray(shifted))
        )
        assert np.abs(moved[:, :2].mean(0)).max() < 1e-8

        # midrange centering (default): the percentile midrange lands at 0
        t = mct.center_arena(np.zeros(6), shifted)
        moved = np.asarray(
            mct.apply_rigid_transform(jnp.asarray(t), jnp.asarray(shifted))
        )
        midrange = np.percentile(moved[:, :2], [1, 99], axis=0).mean(0)
        assert np.abs(midrange).max() < 1e-8


class TestResidualMetric:
    def test_metric_near_zero_on_perfect_calibration(self):
        rig = mct.make_synthetic_rig(
            n_cameras=3, n_frames=30, noise_px=0.0, dropout=0.1, seed=4
        )
        med, reproj, transformed = mct.compute_residual_metric(
            rig.all_calib_uvs,
            rig.all_extrinsics,
            rig.all_intrinsics,
            rig.calib_objpoints,
            rig.calib_poses,
        )
        # Perfect data -> sub-0.01-mm board-frame error.
        assert np.all(med < 1e-2)

    def test_metric_detects_bad_calibration(self):
        rig = mct.make_synthetic_rig(
            n_cameras=3, n_frames=30, noise_px=0.0, dropout=0.1, seed=4
        )
        bad_ext = np.array(rig.all_extrinsics)
        bad_ext[1, 3:] += 30.0  # 30 mm translation error
        med, _, _ = mct.compute_residual_metric(
            rig.all_calib_uvs, bad_ext, rig.all_intrinsics,
            rig.calib_objpoints, rig.calib_poses,
        )
        assert med[1] > 1.0  # the docs' failure heuristic fires

    def test_plot_residuals_figure(self):
        import matplotlib

        matplotlib.use("Agg")
        rig = mct.make_synthetic_rig(
            n_cameras=3, n_frames=20, noise_px=0.1, dropout=0.1, seed=4
        )
        fig, med, _, _ = mct.plot_residuals(
            rig.all_calib_uvs, rig.all_extrinsics, rig.all_intrinsics,
            rig.calib_objpoints, rig.calib_poses,
        )
        assert fig is not None
        assert med.shape == (3,)

    def test_plot_shared_detections(self):
        import matplotlib

        matplotlib.use("Agg")
        rig = mct.make_synthetic_rig(
            n_cameras=3, n_frames=20, noise_px=0.1, dropout=0.3, seed=4
        )
        fig, shared = mct.plot_shared_detections(
            rig.all_calib_uvs, [(0, 1), (1, 2)]
        )
        assert shared.shape == (2, 20)
