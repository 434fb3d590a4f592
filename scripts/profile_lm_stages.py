"""Stage-level TPU timing of the LM iteration (speed-of-light work, r2).

Times build_normal_blocks (jacfwd + block einsums), schur_solve, and
compute_cost as separately-jitted programs on the real TPU, at bench scale
and at stage scale, in the shipped numerics (f64 data + f32 Jacobians).
Prints per-stage wall and the implied fraction of the measured full-iteration
time so optimization effort lands on the dominant stage.

Usage: python scripts/profile_lm_stages.py [n_cameras n_frames ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)  # compile
    jax_tree_materialize(out)
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        jax_tree_materialize(out)
        walls.append(time.time() - t0)
    return float(np.median(walls))


def jax_tree_materialize(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import functools

    import jax.numpy as jnp

    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.models.bundle_adjustment import (
        _params_to_arrays,
    )
    from multicam_calibration_tpu.models.lm_core import (
        LMOptions,
        build_normal_blocks,
        compute_cost,
        lm_solve,
        schur_solve,
    )

    cfgs = []
    args = sys.argv[1:]
    while args:
        cfgs.append((int(args[0]), int(args[1])))
        args = args[2:]
    if not cfgs:
        cfgs = [(6, 1000)]
    frame_chunk = int(os.environ.get("LM_PROFILE_FRAME_CHUNK", "0")) or None

    dtype = jnp.float64
    for C, F in cfgs:
        rig = mct.make_synthetic_rig(
            n_cameras=C, n_frames=F, noise_px=0.3, dropout=0.25, seed=11
        )
        rng = np.random.default_rng(1)
        ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
        cam0 = jnp.asarray(
            _params_to_arrays(ext, rig.all_intrinsics), dtype=dtype
        )
        poses0 = jnp.asarray(np.nan_to_num(rig.calib_poses), dtype=dtype)
        obs_np = rig.all_calib_uvs
        mask_np = ~np.isnan(obs_np).any(-1)
        obs = jnp.asarray(np.nan_to_num(obs_np), dtype=dtype)
        mask = jnp.asarray(mask_np)
        objp = jnp.asarray(rig.calib_objpoints, dtype=dtype)
        # The shipped accelerator recipe (bundle_adjust auto-numerics):
        # f64 residual/gradient, f32 Jacobians + blocks + Schur + cost.
        opts = LMOptions(
            jac_dtype="float32",
            block_dtype="float32",
            cost_dtype="float32",
            solve_dtype="float32",
            lambda_escalation=3.0,
            grad_dtype="float32",
            gtol_rel=1e-6,
            frame_chunk=frame_chunk,
        )
        n_obs = int(mask_np.sum())
        print(f"=== {C} cams x {F} frames, {n_obs} obs ===", flush=True)

        # Each timed program returns a SCALAR reduction of its outputs: on
        # this container the host<->device link is a ~24 MB/s remote
        # tunnel, so returning the block tensors themselves would time the
        # transfer (hundreds of MB at config 5), not the compute.
        def blocks_scalar(cam, poses, obs_, mask_, objp_):
            blocks = build_normal_blocks(cam, poses, obs_, mask_, objp_, opts)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(blocks)
                       if jnp.issubdtype(leaf.dtype, jnp.floating))

        jit_blocks = jax.jit(blocks_scalar)
        t_blocks = time_fn(jit_blocks, cam0, poses0, obs, mask, objp)
        print(f"build_normal_blocks: {t_blocks*1e3:9.2f} ms", flush=True)

        blocks = jax.jit(functools.partial(build_normal_blocks, opts=opts))(
            cam0, poses0, obs, mask, objp
        )

        def schur_scalar(blocks_, lam):
            dcam, dpose = schur_solve(blocks_, lam, opts=opts)
            return jnp.sum(dcam) + jnp.sum(dpose)

        jit_schur = jax.jit(schur_scalar)
        t_schur = time_fn(jit_schur, blocks, 1e-4)
        print(f"schur_solve:         {t_schur*1e3:9.2f} ms", flush=True)

        jit_cost = jax.jit(
            functools.partial(compute_cost, opts=opts),
        )
        t_cost = time_fn(jit_cost, cam0, poses0, obs, mask, objp)
        print(f"compute_cost:        {t_cost*1e3:9.2f} ms", flush=True)

        # Full solve for the per-iteration comparison.
        out = lm_solve(cam0, poses0, obs, mask, objp, opts)
        jax_tree_materialize(out[:2])
        t0 = time.time()
        cam, poses_adj, info = lm_solve(cam0, poses0, obs, mask, objp, opts)
        n_iters = int(info["n_iters"])
        nfev = int(info["nfev"])
        jax_tree_materialize((cam, poses_adj))
        t_full = time.time() - t0
        per_iter = t_full / max(n_iters, 1)
        tries = nfev - 1
        model = (
            n_iters * t_blocks + tries * (t_schur + t_cost) + t_cost
        )
        print(
            f"lm_solve: {t_full:.3f} s / {n_iters} iters "
            f"({per_iter*1e3:.1f} ms/iter, nfev {nfev}); "
            f"stage-sum model {model:.3f} s "
            f"({model/t_full:.0%} of measured)",
            flush=True,
        )
        print(
            f"per-iter split: blocks {t_blocks*1e3:.1f} | "
            f"schur {t_schur*1e3:.1f} | cost {t_cost*1e3:.1f} ms; "
            f"obs/s through blocks: {n_obs/t_blocks/1e6:.2f} M",
            flush=True,
        )


if __name__ == "__main__":
    main()
