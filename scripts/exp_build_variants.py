"""Experiment: where does the config-5 block build's wall go?

Times build_normal_blocks variants (frame_chunk x data dtype) as standalone
jitted programs on the real TPU at 64cam x 20k frames. Variants answer two
questions the r2 verdict left open on the way to speed-of-light:
- does a bigger frame chunk amortize the lax.scan per-step overhead?
- how much of the wall is emulated-f64 residual work vs f32 compute?

Usage: python scripts/exp_build_variants.py [C F]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/exp_build_rig_{C}x{F}.npz"


def get_problem(C, F):
    path = CACHE.format(C=C, F=F)
    if os.path.exists(path):
        d = np.load(path)
        return d["cam0"], d["poses0"], d["obs"], d["mask"], d["objp"]
    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.models.bundle_adjustment import (
        _params_to_arrays,
    )

    rig = mct.make_synthetic_rig(
        n_cameras=C, n_frames=F, noise_px=0.3, dropout=0.25, seed=11
    )
    rng = np.random.default_rng(1)
    ext = rig.all_extrinsics + rng.normal(0, 1e-3, rig.all_extrinsics.shape)
    cam0 = _params_to_arrays(ext, rig.all_intrinsics)
    poses0 = np.nan_to_num(rig.calib_poses)
    obs_np = rig.all_calib_uvs
    mask = ~np.isnan(obs_np).any(-1)
    obs = np.nan_to_num(obs_np)
    np.savez(
        path, cam0=cam0, poses0=poses0, obs=obs, mask=mask,
        objp=rig.calib_objpoints,
    )
    return cam0, poses0, obs, mask, np.asarray(rig.calib_objpoints)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from multicam_calibration_tpu.models.lm_core import (
        LMOptions,
        build_normal_blocks,
    )

    C, F = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (64, 20000)
    cam0_np, poses0_np, obs_np, mask_np, objp_np = get_problem(C, F)
    n_obs = int(mask_np.sum())
    print(f"=== {C} cams x {F} frames, {n_obs} obs ===", flush=True)

    mask = jnp.asarray(mask_np)

    def run(tag, dtype, chunk, reps=4):
        opts = LMOptions(
            jac_dtype="float32", block_dtype="float32", cost_dtype="float32",
            solve_dtype="float32", grad_dtype="float32",
            lambda_escalation=3.0, frame_chunk=chunk,
        )
        cam0 = jnp.asarray(cam0_np, dtype)
        poses0 = jnp.asarray(poses0_np, dtype)
        obs = jnp.asarray(obs_np, dtype)
        objp = jnp.asarray(objp_np, dtype)

        def blocks_scalar(cam, poses, obs_, mask_, objp_):
            blocks = build_normal_blocks(cam, poses, obs_, mask_, objp_, opts)
            return sum(
                jnp.sum(leaf) for leaf in jax.tree.leaves(blocks)
                if jnp.issubdtype(leaf.dtype, jnp.floating)
            )

        fn = jax.jit(blocks_scalar)
        t0 = time.time()
        out = fn(cam0, poses0, obs, mask, objp)
        np.asarray(out)
        t_first = time.time() - t0
        walls = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(cam0, poses0, obs, mask, objp)
            np.asarray(out)
            walls.append(time.time() - t0)
        w = float(np.median(walls))
        print(
            f"{tag:28s} chunk={chunk or 'dense':>5} dtype={dtype.__name__:8s}"
            f" wall={w*1e3:9.2f} ms  obs/s={n_obs/w/1e6:8.1f} M"
            f"  (first call {t_first:.1f} s)",
            flush=True,
        )
        return w

    run("recipe f64", jnp.float64, 256)
    run("recipe f64", jnp.float64, 1024)
    run("recipe f64", jnp.float64, 4096)
    run("pure f32 data", jnp.float32, 256)
    run("pure f32 data", jnp.float32, 1024)
    run("pure f32 data", jnp.float32, 4096)


if __name__ == "__main__":
    main()
