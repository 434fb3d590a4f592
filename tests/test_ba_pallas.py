"""Fused Pallas block-build kernel vs the XLA analytic oracle.

The kernel (ops/ba_pallas.py) replaces the dominant stage of the Schur-LM
iteration. These tests pin (a) the two-float residual's f64-grade accuracy
and (b) block/gradient/cost parity with lm_core's analytic path under the
shipped TPU numerics recipe (f32 Jacobians/blocks/products, f64 residual).
Runs in Pallas interpret mode on the CPU test mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.models.bundle_adjustment import (
    _params_to_arrays,
)
from multicam_calibration_tpu.models.lm_core import (
    LMOptions,
    _linearize_analytic,
    compute_residuals,
)
from multicam_calibration_tpu.ops.ba_pallas import (
    ba_chunk_blocks,
    ba_prepare_obs,
)

C, F, N = 3, 8, 35


@pytest.fixture(scope="module")
def problem():
    rig = mct.make_synthetic_rig(
        n_cameras=C, n_frames=F, noise_px=0.3, dropout=0.3, seed=4
    )
    rng = np.random.default_rng(2)
    ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
    cam = jnp.asarray(_params_to_arrays(ext, rig.all_intrinsics), jnp.float64)
    poses = jnp.asarray(np.nan_to_num(rig.calib_poses), jnp.float64)
    obs_np = rig.all_calib_uvs
    mask = jnp.asarray(~np.isnan(obs_np).any(-1))
    obs = jnp.asarray(np.nan_to_num(obs_np), jnp.float64)
    objp = jnp.asarray(rig.calib_objpoints, jnp.float64)
    return cam, poses, obs, mask, objp


def _run_kernel(problem, tile_f=8):
    cam, poses, obs, mask, objp = problem
    obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
    return ba_chunk_blocks(
        cam, poses, obs_hi, obs_lo, msk, objp, tile_f=tile_f, interpret=True
    )


class TestTwoFloatResidual:
    def test_residual_matches_f64_oracle(self, problem):
        """The compensated-f32 residual agrees with the f64 chain to
        ~1e-10 px — far below the 1e-5 px level the gradient contract
        needs (CLAUDE.md: obs - pred cancels ~4 digits)."""
        cam, poses, obs, mask, objp = problem
        U, V, W, g_cam, g_pose, cost = _run_kernel(problem)
        # Reconstruct the kernel's residual through the cost: compare
        # per-(c, f) soft-L1 cost partials against the f64 residual's.
        r64 = compute_residuals(cam, poses, obs, mask, objp)
        z = jnp.where(mask[..., None], r64**2, 0.0)
        rho64 = jnp.sum(2.0 * (jnp.sqrt(1.0 + z) - 1.0) * 0.5, axis=(-2, -1))
        np.testing.assert_allclose(
            np.asarray(cost, np.float64), np.asarray(rho64), rtol=2e-5,
            atol=1e-7,
        )

    def test_blocks_match_analytic_path(self, problem):
        cam, poses, obs, mask, objp = problem
        opts = LMOptions(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32",
        )
        U0, V0, W0, g_cam0, g_pose0, cost0 = _linearize_analytic(
            cam, poses, obs, mask, objp, opts
        )
        U, V, W, g_cam, g_pose, cost = _run_kernel(problem)
        scale = float(jnp.abs(U0).max())
        np.testing.assert_allclose(
            np.asarray(U, np.float64), np.asarray(U0), atol=2e-5 * scale
        )
        np.testing.assert_allclose(
            np.asarray(V.astype(jnp.float64)), np.asarray(V0),
            atol=2e-5 * float(jnp.abs(V0).max()),
        )
        np.testing.assert_allclose(
            np.asarray(W.astype(jnp.float64)), np.asarray(W0),
            atol=2e-5 * float(jnp.abs(W0).max()),
        )
        # Gradients: per-(c,f) f32 fragments; compare after the f64
        # frame/camera reductions the caller performs.
        g_cam_r = np.asarray(g_cam, np.float64).sum(1)
        g_pose_r = np.asarray(g_pose, np.float64).sum(0)
        np.testing.assert_allclose(
            g_cam_r, np.asarray(g_cam0),
            atol=3e-5 * max(1.0, float(jnp.abs(g_cam0).max())),
        )
        np.testing.assert_allclose(
            g_pose_r, np.asarray(g_pose0),
            atol=3e-5 * max(1.0, float(jnp.abs(g_pose0).max())),
        )
        np.testing.assert_allclose(
            float(np.asarray(cost, np.float64).sum()), float(cost0),
            rtol=3e-5,
        )

    def test_blocks_match_analytic_path_linear_loss(self, problem):
        """loss='linear' parity: pins the kernel's 0.5*r^2 cost contract
        (_robust_cost, lm_core.py) and the unit IRLS weights."""
        cam, poses, obs, mask, objp = problem
        opts = LMOptions(
            loss="linear", jac_dtype="float32", block_dtype="float32",
            grad_dtype="float32", cost_dtype="float32",
        )
        U0, V0, W0, g_cam0, g_pose0, cost0 = _linearize_analytic(
            cam, poses, obs, mask, objp, opts
        )
        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
        U, V, W, g_cam, g_pose, cost = ba_chunk_blocks(
            cam, poses, obs_hi, obs_lo, msk, objp, tile_f=8,
            loss_linear=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(U, np.float64), np.asarray(U0),
            atol=2e-5 * float(jnp.abs(U0).max()),
        )
        np.testing.assert_allclose(
            np.asarray(g_cam, np.float64).sum(1), np.asarray(g_cam0),
            atol=3e-5 * max(1.0, float(jnp.abs(g_cam0).max())),
        )
        np.testing.assert_allclose(
            float(np.asarray(cost, np.float64).sum()), float(cost0),
            rtol=3e-5,
        )

    def test_auto_dispatch_policy(self, problem):
        """'auto' routes to the kernel only on TPU backends with the
        certified recipe — never off-TPU (this CPU mesh), and never for
        recipes the kernel does not implement."""
        from multicam_calibration_tpu.models.lm_core import (
            _pallas_block_build,
        )

        _, _, _, _, objp = problem
        recipe = dict(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32",
        )
        # Off-TPU (the CPU test backend): auto must take the XLA path.
        assert not _pallas_block_build(
            LMOptions(**recipe), jnp.float64, objp
        )
        # Non-kernel recipe (f64 blocks) is never eligible, and forcing
        # the kernel on it must raise rather than silently run.
        assert not _pallas_block_build(LMOptions(), jnp.float64, objp)
        with pytest.raises(ValueError):
            _pallas_block_build(
                LMOptions(block_impl="pallas"), jnp.float64, objp
            )

    def test_lm_solve_converges_through_kernel(self, problem):
        """Full Schur-LM through the fused kernel (forced, interpret mode)
        reaches the same optimum as the XLA path — the integration-level
        guarantee that the two-float residual anchors the same fixed
        point."""
        from multicam_calibration_tpu.models.lm_core import lm_solve

        cam, poses, obs, mask, objp = problem
        base = dict(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32", solve_dtype="float32",
            lambda_escalation=3.0, max_iters=40,
        )
        cam_x, poses_x, info_x = lm_solve(
            cam, poses, obs, mask, objp, LMOptions(block_impl="xla", **base)
        )
        cam_p, poses_p, info_p = lm_solve(
            cam, poses, obs, mask, objp,
            LMOptions(block_impl="pallas", **base),
        )
        cx, cp = float(info_x["final_cost"]), float(info_p["final_cost"])
        assert cp <= cx * 1.001, (cp, cx)
        # Parameters are only defined up to the rig's gauge; compare the
        # physical quantity instead — per-observation reprojection RMSE.
        def rmse(c, p):
            r = compute_residuals(c, p, obs, mask, objp)
            r2 = np.asarray(jnp.where(mask[..., None], r**2, 0.0))
            return float(np.sqrt(r2.sum() / mask.sum() / 2))

        assert abs(rmse(cam_p, poses_p) - rmse(cam_x, poses_x)) < 1e-3

    def test_chunked_matches_dense_through_kernel(self, problem):
        """frame_chunk path (scan + padding) through the kernel equals the
        dense kernel path."""
        from multicam_calibration_tpu.models.lm_core import (
            build_normal_blocks,
        )

        cam, poses, obs, mask, objp = problem
        base = dict(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32", block_impl="pallas",
        )
        dense = build_normal_blocks(
            cam, poses, obs, mask, objp, LMOptions(**base)
        )
        chunked = build_normal_blocks(
            cam, poses, obs, mask, objp, LMOptions(frame_chunk=4, **base)
        )
        scale = float(jnp.abs(dense.U).max())
        np.testing.assert_allclose(
            np.asarray(chunked.U), np.asarray(dense.U), atol=1e-5 * scale
        )
        np.testing.assert_allclose(
            float(chunked.cost), float(dense.cost), rtol=1e-5
        )
        # chunked W is (nc, C, ck, 12, 6); stitch frames back together
        W_c = np.asarray(chunked.W)
        W_c = np.moveaxis(W_c, 0, 1).reshape(
            W_c.shape[1], -1, 12, 6
        )[:, : poses.shape[0]]
        np.testing.assert_allclose(
            W_c, np.asarray(dense.W),
            atol=1e-5 * float(jnp.abs(dense.W).max()),
        )

    def test_masked_frames_contribute_nothing(self, problem):
        """Padded/empty observations produce exactly zero blocks (the
        guarded chain yields finite garbage; the weight mask kills it)."""
        cam, poses, obs, mask, objp = problem
        mask0 = mask.at[:, -2:].set(False)
        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask0)
        U, V, W, g_cam, g_pose, cost = ba_chunk_blocks(
            cam, poses, obs_hi, obs_lo, msk, objp, tile_f=8, interpret=True
        )
        assert float(jnp.abs(V[-2:]).max()) == 0.0
        assert float(jnp.abs(W[:, -2:]).max()) == 0.0
        assert float(jnp.abs(g_pose[:, -2:]).max()) == 0.0
        assert float(jnp.abs(cost[:, -2:]).max()) == 0.0
        for x in (U, V, W, g_cam, g_pose, cost):
            assert np.isfinite(np.asarray(x)).all()

    def test_padded_frames_near_identity_camera(self):
        """Regression (round-4 bench failure): frame padding + a camera
        with TINY but nonzero extrinsics must not poison the blocks.

        ba_chunk_blocks zero-pads the frame axis to the tile size; padded
        frames carry zero poses, so the board points sit in the z = 0
        plane. A camera at exactly identity hits the exact-zero z guard,
        but after any small step or perturbation (bench.py times from
        cam0 + 1e-5 * k; the gauge root starts at identity) the padded
        frames see |z| ~ 1e-5..1e-3 and the f32 1/z Jacobian chain
        overflows — inf * 0 = NaN through the masked U contraction, NaN
        normal equations, and every LM step rejected (BENCH_r04 first
        attempt). The fix routes ALL masked lanes through the benign
        z = 1 branch; this test pins it at a non-divisible frame count
        with the bench-style perturbation, against the XLA oracle.
        """
        rig = mct.make_synthetic_rig(
            n_cameras=2, n_frames=70, noise_px=0.3, dropout=0.3, seed=9
        )
        # Camera 0 = gauge root at identity in this rig construction;
        # the +3e-5 shift reproduces bench.py's timed-run perturbation.
        cam = jnp.asarray(
            _params_to_arrays(rig.all_extrinsics, rig.all_intrinsics),
            jnp.float64,
        ) + 3e-5
        poses = jnp.asarray(np.nan_to_num(rig.calib_poses), jnp.float64)
        obs_np = rig.all_calib_uvs
        mask = jnp.asarray(~np.isnan(obs_np).any(-1))
        obs = jnp.asarray(np.nan_to_num(obs_np), jnp.float64)
        objp = jnp.asarray(rig.calib_objpoints, jnp.float64)

        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
        # 70 % 64 != 0 -> 58 zero-pose padded frames, the trigger.
        U, V, W, g_cam, g_pose, cost = ba_chunk_blocks(
            cam, poses, obs_hi, obs_lo, msk, objp, tile_f=64, interpret=True
        )
        for name, x in (
            ("U", U), ("V", V), ("W", W), ("g_cam", g_cam),
            ("g_pose", g_pose), ("cost", cost),
        ):
            assert np.isfinite(np.asarray(x)).all(), f"{name} non-finite"

        opts = LMOptions(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32",
        )
        U0, V0, W0, g_cam0, g_pose0, cost0 = _linearize_analytic(
            cam, poses, obs, mask, objp, opts
        )
        np.testing.assert_allclose(
            np.asarray(U, np.float64), np.asarray(U0),
            atol=2e-5 * float(jnp.abs(U0).max()),
        )
        np.testing.assert_allclose(
            np.asarray(g_cam, np.float64).sum(1), np.asarray(g_cam0),
            atol=3e-5 * max(1.0, float(jnp.abs(g_cam0).max())),
        )
        np.testing.assert_allclose(
            float(np.asarray(cost, np.float64).sum()), float(cost0),
            rtol=3e-5,
        )


class TestCostKernel:
    """Fused cost-evaluation kernel (ops/ba_pallas.ba_chunk_cost)."""

    def test_cost_fragments_match_f64(self, problem):
        """Per-(c,f) soft-L1 cost fragments from the cost-only kernel
        match the f64 residual's, including at a padding-inducing tile
        size (F=8 with tile_f=64 -> 56 padded frames)."""
        from multicam_calibration_tpu.ops.ba_pallas import ba_chunk_cost

        cam, poses, obs, mask, objp = problem
        r64 = compute_residuals(cam, poses, obs, mask, objp)
        z = jnp.where(mask[..., None], r64**2, 0.0)
        rho64 = jnp.sum(jnp.sqrt(1.0 + z) - 1.0, axis=(-2, -1))
        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
        for tile_f in (8, 64):
            cost = ba_chunk_cost(
                cam, poses, obs_hi, obs_lo, msk, objp, tile_f=tile_f,
                interpret=True,
            )
            assert np.isfinite(np.asarray(cost)).all()
            np.testing.assert_allclose(
                np.asarray(cost, np.float64), np.asarray(rho64),
                rtol=2e-5, atol=1e-7,
            )

    def test_compute_cost_dispatch(self, problem):
        """cost_impl='pallas' through compute_cost equals the XLA
        cost_dtype='float32' path (the recipe it replaces) to the f32
        cost-granularity level, and 'xla'/'auto' off-TPU stay on XLA."""
        from multicam_calibration_tpu.models.lm_core import (
            _pallas_cost_eval, compute_cost,
        )

        cam, poses, obs, mask, objp = problem
        base = dict(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32",
        )
        assert not _pallas_cost_eval(LMOptions(**base), cam.dtype, objp)
        assert not _pallas_cost_eval(
            LMOptions(cost_impl="auto", **base), cam.dtype, objp
        )  # off-TPU
        with pytest.raises(ValueError):
            _pallas_cost_eval(
                LMOptions(cost_impl="pallas", jac_dtype="float32"),
                cam.dtype, objp,
            )  # cost_dtype=None is not the kernel recipe
        c_xla = compute_cost(
            cam, poses, obs, mask, objp, LMOptions(**base)
        )
        c_pal = compute_cost(
            cam, poses, obs, mask, objp,
            LMOptions(cost_impl="pallas", **base),
        )
        assert np.isfinite(float(c_pal))
        np.testing.assert_allclose(float(c_pal), float(c_xla), rtol=3e-5)

    def test_lm_solve_with_pallas_cost(self, problem):
        """Full LM with BOTH fused kernels (blocks + per-try cost) reaches
        the XLA path's optimum."""
        from multicam_calibration_tpu.models.lm_core import lm_solve

        cam, poses, obs, mask, objp = problem
        base = dict(
            jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
            cost_dtype="float32", solve_dtype="float32",
            lambda_escalation=3.0, max_iters=40,
        )
        _, _, info_x = lm_solve(
            cam, poses, obs, mask, objp, LMOptions(block_impl="xla", **base)
        )
        _, _, info_p = lm_solve(
            cam, poses, obs, mask, objp,
            LMOptions(block_impl="pallas", cost_impl="pallas", **base),
        )
        cx, cp = float(info_x["final_cost"]), float(info_p["final_cost"])
        assert cp <= cx * 1.001, (cp, cx)


class TestShardMapPallas:
    def test_sharded_lm_solve_through_kernel_matches_unsharded(self, problem):
        """block_impl='pallas' INSIDE shard_map over the CPU mesh (VERDICT
        r4 #4: on a real multi-chip mesh auto would route the kernel inside
        shard_map as a first-ever execution — CI must at least see the
        combination in interpret mode). The sharded descent's cost
        trajectory must match the unsharded kernel descent exactly (the
        only cross-device math is one psum of the reduced camera system
        per iteration)."""
        from multicam_calibration_tpu.parallel.sharded import (
            sharded_lm_solve,
        )

        cam, poses, obs, mask, objp = problem
        recipe = dict(
            jac_dtype="float32", block_dtype="float32",
            cost_dtype="float32", solve_dtype="float32",
            grad_dtype="float32",
        )
        opts = LMOptions(max_iters=3, block_impl="pallas", **recipe)
        n_dev = min(4, jax.device_count("cpu"))
        mesh = jax.sharding.Mesh(
            np.array(jax.devices("cpu")[:n_dev]), ("frames",)
        )
        cam_m, poses_m, info_m = sharded_lm_solve(
            cam, poses, obs, mask, objp, opts, mesh=mesh
        )
        cam_s, poses_s, info_s = mct.models.lm_core.lm_solve(
            cam, poses, obs, mask, objp, opts
        )
        n = min(int(info_m["n_iters"]), int(info_s["n_iters"]))
        assert n >= 1
        hist_m = np.asarray(info_m["history"], np.float64)
        hist_s = np.asarray(info_s["history"], np.float64)
        # Looser than the XLA-path dryrun's 2e-6: the kernel emits f32
        # per-(c,f) fragments, and sharding changes the frame-reduction
        # ORDER (per-shard partial sums + psum), so trajectories agree to
        # f32-fragment rounding (~1.5e-5 measured after 3 iters), not f64.
        np.testing.assert_allclose(hist_m[:n, 0], hist_s[:n, 0], rtol=5e-5)
        np.testing.assert_allclose(
            float(info_m["final_cost"]), float(info_s["final_cost"]),
            rtol=5e-5,
        )
