"""BA checkpoint/resume tests (SURVEY.md §5: intra-optimization checkpoints,
which the reference lacks entirely — it only caches between stages)."""
import numpy as np
import pytest

import multicam_calibration_tpu as mct


@pytest.fixture(scope="module")
def problem():
    rig = mct.make_synthetic_rig(
        n_cameras=3, n_frames=24, noise_px=0.4, dropout=0.1, seed=3
    )
    ext, intr, poses, _ = mct.calibrate(
        rig.all_calib_uvs, rig.img_sizes, rig.calib_objpoints,
        verbose=False, n_samples_for_intrinsics=15,
    )
    return rig, ext, intr, poses


def test_checkpointed_run_matches_plain(problem, tmp_path):
    rig, ext, intr, poses = problem
    plain = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False,
    )
    ck = str(tmp_path / "ba.npz")
    chunked = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=3,
    )
    # Chunked LM restarts reset the damping/patience state at chunk
    # boundaries, so the walk may end at a different point of the flat
    # cost valley — the invariant is equal-quality optima, not equal
    # parameters (the BA valley is gauge-soft).
    np.testing.assert_allclose(
        chunked[4]["final_cost"], plain[4]["final_cost"], rtol=1e-3
    )

    def rmse(adj):
        ext_a, intr_a, poses_a, use_a, _ = adj
        pred = np.asarray(
            mct.predict_calib_uvs(ext_a, intr_a, rig.calib_objpoints, poses_a)
        )
        err = np.linalg.norm(rig.all_calib_uvs[:, use_a] - pred, axis=-1)
        return np.sqrt(np.nanmean(err**2))

    assert abs(rmse(chunked) - rmse(plain)) < 0.05
    import os

    assert os.path.exists(ck)


def test_resume_from_checkpoint(problem, tmp_path):
    rig, ext, intr, poses = problem
    ck = str(tmp_path / "resume.npz")
    # Simulate a killed run: only allow a few iterations, checkpointing.
    partial = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=2, max_iters=2,
    )
    saved = dict(np.load(ck))
    assert saved["it_done"] >= 1
    # Resume: picks up params/lambda/frame selection from the file.
    resumed = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=5,
    )
    full = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False,
    )
    np.testing.assert_array_equal(resumed[3], full[3])  # same use_frames
    np.testing.assert_allclose(
        resumed[4]["final_cost"], full[4]["final_cost"], rtol=1e-3
    )
    assert resumed[4]["final_cost"] <= partial[4]["final_cost"] + 1e-9


def test_checkpoint_carries_grad0_anchor(problem, tmp_path):
    """The gtol_rel stop is anchored to the FIRST linearization's gradient
    norm; a resumed run must inherit that anchor from the checkpoint, not
    re-base it on its own (already-contracted) starting gradient."""
    rig, ext, intr, poses = problem
    ck = str(tmp_path / "g0.npz")
    mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=2, max_iters=2,
    )
    saved = dict(np.load(ck))
    assert "grad0" in saved and float(saved["grad0"]) > 0
    resumed = mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=5,
    )
    assert np.isclose(
        float(resumed[4]["grad0"]), float(saved["grad0"]), rtol=1e-6
    )


def test_checkpoint_fingerprint_mismatch_raises(problem, tmp_path):
    """Same-shaped but different data must not silently resume (ADVICE r1)."""
    rig, ext, intr, poses = problem
    ck = str(tmp_path / "fp.npz")
    mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=2, max_iters=2,
    )
    shifted = rig.all_calib_uvs + 0.25  # same shape, different problem
    with pytest.raises(ValueError, match="different problem"):
        mct.bundle_adjust(
            shifted, ext, intr, rig.calib_objpoints, poses,
            verbose=False, checkpoint_path=ck,
        )
    # Different seed changes the frame selection -> also a different problem.
    with pytest.raises(ValueError, match="different problem"):
        mct.bundle_adjust(
            rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
            verbose=False, checkpoint_path=ck, seed=7,
        )


def test_checkpoint_problem_mismatch_raises(problem, tmp_path):
    rig, ext, intr, poses = problem
    ck = str(tmp_path / "mm.npz")
    mct.bundle_adjust(
        rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
        verbose=False, checkpoint_path=ck, checkpoint_every=2, max_iters=2,
    )
    with pytest.raises(ValueError, match="different problem"):
        mct.bundle_adjust(
            rig.all_calib_uvs[:2], ext[:2], intr[:2], rig.calib_objpoints,
            poses, verbose=False, checkpoint_path=ck,
        )
