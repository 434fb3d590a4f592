"""Analytic BA Jacobians vs the jacfwd autodiff oracle.

The closed-form blocks (lm_core._analytic_pred_and_jacs — the chain rule of
project_board_points written out, replacing the reference's finite-difference
grouped Jacobian, /root/reference/multicam_calibration/bundle_adjustment.py:
301-313) must agree with jax.jacfwd to f64 roundoff, and the full LM solve
must follow the same trajectory with either Jacobian.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicam_calibration_tpu.models.lm_core import (
    LMOptions,
    _analytic_pred_and_jacs,
    _value_and_jacs,
    build_normal_blocks,
    lm_solve,
)


def _random_problem(rng, C=3, F=5, N=7):
    cam = np.zeros((C, 12))
    cam[:, 0] = rng.uniform(400, 600, C)
    cam[:, 1] = rng.uniform(400, 600, C)
    cam[:, 2] = rng.uniform(300, 340, C)
    cam[:, 3] = rng.uniform(220, 260, C)
    cam[:, 4] = rng.uniform(-0.3, 0.3, C)
    cam[:, 5] = rng.uniform(-0.1, 0.1, C)
    cam[:, 6:9] = rng.normal(0, 0.5, (C, 3))
    cam[:, 9:12] = rng.normal(0, 0.2, (C, 3))
    cam[:, 11] += 0.5
    pose = np.zeros((F, 6))
    pose[:, :3] = rng.normal(0, 0.8, (F, 3))
    pose[0, :3] = 0.0  # exercise the theta=0 series branch
    pose[:, 3:] = rng.normal(0, 0.3, (F, 3))
    pose[:, 5] += 2.0
    objp = rng.uniform(-0.2, 0.2, (N, 3))
    return jnp.asarray(cam), jnp.asarray(pose), jnp.asarray(objp)


def test_analytic_jacobian_matches_jacfwd():
    rng = np.random.default_rng(0)
    cam, pose, objp = _random_problem(rng)
    pred_a, A_a, B_a = _analytic_pred_and_jacs(cam, pose, objp)
    for c in range(cam.shape[0]):
        for f in range(pose.shape[0]):
            pred_o, (A_o, B_o) = _value_and_jacs(cam[c], pose[f], objp)
            np.testing.assert_allclose(pred_a[c, f], pred_o, atol=1e-10)
            np.testing.assert_allclose(A_a[c, f], A_o, atol=1e-8, rtol=1e-10)
            np.testing.assert_allclose(B_a[c, f], B_o, atol=1e-9, rtol=1e-10)


def test_analytic_jacobian_f32_mode():
    """jac_dtype='float32' emits f32 blocks that match f64 to f32 rounding."""
    rng = np.random.default_rng(1)
    cam, pose, objp = _random_problem(rng)
    _, A64, B64 = _analytic_pred_and_jacs(cam, pose, objp)
    _, A32, B32 = _analytic_pred_and_jacs(cam, pose, objp, jac_dtype="float32")
    assert A32.dtype == jnp.float32 and B32.dtype == jnp.float32
    scale_a = np.maximum(np.abs(np.asarray(A64)), 1.0)
    scale_b = np.maximum(np.abs(np.asarray(B64)), 1.0)
    # A few f32 ulps through the ~10-op chain (the random problem includes
    # near-plane points whose Jacobian entries reach ~1e13, so this is a
    # RELATIVE bound; the approximate Hessian tolerates far more).
    assert np.max(np.abs(np.asarray(A32) - np.asarray(A64)) / scale_a) < 1e-4
    assert np.max(np.abs(np.asarray(B32) - np.asarray(B64)) / scale_b) < 1e-4


@pytest.mark.parametrize("frame_chunk", [None, 2])
def test_normal_blocks_match(frame_chunk):
    """build_normal_blocks agrees between jacobian='analytic' and 'jacfwd',
    with observation masks, frozen params, and chunking in play."""
    rng = np.random.default_rng(2)
    cam, pose, objp = _random_problem(rng, C=3, F=5, N=7)
    C, F, N = 3, 5, 7
    pred, _, _ = _analytic_pred_and_jacs(cam, pose, objp)
    obs = pred + 0.5 * rng.normal(size=(C, F, N, 2))
    mask = rng.random((C, F, N)) > 0.3
    mask[:, 1, :] = False  # one fully-unobserved frame
    obs = jnp.asarray(np.where(mask[..., None], obs, np.nan))
    mask = jnp.asarray(mask)
    cam_free = jnp.ones((C, 12)).at[0, :].set(0.0)  # gauge-freeze camera 0
    pose_free = jnp.ones((F, 6)).at[2, 3:].set(0.0)
    kwargs = dict(cam_free=cam_free, pose_free=pose_free)
    b_a = build_normal_blocks(
        cam, pose, obs, mask, objp,
        LMOptions(jacobian="analytic", frame_chunk=frame_chunk), **kwargs,
    )
    b_j = build_normal_blocks(
        cam, pose, obs, mask, objp,
        LMOptions(jacobian="jacfwd", frame_chunk=frame_chunk), **kwargs,
    )
    for name in ("U", "V", "W", "g_cam", "g_pose", "cost"):
        np.testing.assert_allclose(
            np.asarray(getattr(b_a, name)),
            np.asarray(getattr(b_j, name)),
            atol=1e-7,
            rtol=1e-9,
            err_msg=name,
        )


def test_lm_solve_same_trajectory():
    """Full LM runs converge to the same solution with either Jacobian."""
    rng = np.random.default_rng(3)
    cam, pose, objp = _random_problem(rng, C=3, F=12, N=7)
    C, F, N = 3, 12, 7
    pred, _, _ = _analytic_pred_and_jacs(cam, pose, objp)
    obs = jnp.asarray(np.asarray(pred) + 0.2 * rng.normal(size=(C, F, N, 2)))
    mask = jnp.ones((C, F, N), bool)
    cam0 = cam + 1e-3 * rng.normal(size=cam.shape)
    pose0 = pose + 1e-3 * rng.normal(size=pose.shape)
    outs = {}
    for jac in ("analytic", "jacfwd"):
        opts = LMOptions(jacobian=jac, max_iters=30)
        cam_out, pose_out, info = lm_solve(cam0, pose0, obs, mask, objp, opts)
        outs[jac] = (np.asarray(cam_out), np.asarray(pose_out),
                     float(info["final_cost"]), int(info["n_iters"]))
    assert outs["analytic"][3] == outs["jacfwd"][3]  # same iteration count
    np.testing.assert_allclose(outs["analytic"][2], outs["jacfwd"][2], rtol=1e-8)
    np.testing.assert_allclose(outs["analytic"][0], outs["jacfwd"][0], atol=1e-6)
