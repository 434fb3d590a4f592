"""Decompose the pallas build wall: obs prep | per-chunk XLA prep | kernel.

Usage: python scripts/exp_ba_pallas_split.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from exp_build_variants import get_problem  # noqa: E402


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    from multicam_calibration_tpu.ops.ba_pallas import (
        ba_chunk_blocks,
        ba_prepare_obs,
    )

    C, F = 64, 20000
    cam0_np, poses0_np, obs_np, mask_np, objp_np = get_problem(C, F)
    F = 19968  # multiple of the 256-frame chunk (the library pads; we slice)
    cam0 = jnp.asarray(cam0_np, jnp.float64)
    poses0 = jnp.asarray(poses0_np[:F], jnp.float64)
    obs = jnp.asarray(obs_np[:, :F], jnp.float64)
    mask = jnp.asarray(mask_np[:, :F])
    objp = jnp.asarray(objp_np, jnp.float64)

    def t(fn, *a, reps=4):
        np.asarray(jax.tree.leaves(fn(*a))[0])
        ws = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jax.tree.leaves(fn(*a))[0])
            ws.append(time.time() - t0)
        return float(np.median(ws))

    prep = jax.jit(ba_prepare_obs)
    w_prep = t(prep, obs, mask)
    print(f"ba_prepare_obs (once/build): {w_prep*1e3:8.2f} ms", flush=True)

    obs_hi, obs_lo, msk = prep(obs, mask)
    chunk = 256
    nc = F // chunk
    pose_c = poses0.reshape(nc, chunk, 6)
    ohi_c = jnp.moveaxis(obs_hi.reshape(C, nc, chunk, -1), 1, 0)
    olo_c = jnp.moveaxis(obs_lo.reshape(C, nc, chunk, -1), 1, 0)
    msk_c = jnp.moveaxis(msk.reshape(C, nc, chunk, -1), 1, 0)

    def scan_build(cam, pose_c_, oh, ol, mk):
        def body(carry, xs):
            p, a, b, m = xs
            out = ba_chunk_blocks(cam, p, a, b, m, objp)
            return carry + out[0].astype(jnp.float64).sum(), (
                out[2].sum(),
            )
        s, _ = lax.scan(body, jnp.zeros((), jnp.float64),
                        (pose_c_, ohi_c, olo_c, msk_c))
        return s

    full = jax.jit(scan_build)
    w_full = t(full, cam0, pose_c, ohi_c, olo_c, msk_c)
    print(f"scan(prep+kernel):           {w_full*1e3:8.2f} ms", flush=True)

    # Per-chunk XLA prep only (everything in ba_chunk_blocks BEFORE the
    # pallas_call): replicate it via a kernel-free stand-in.
    from multicam_calibration_tpu.ops.rotation import (
        so3_exp, so3_left_jacobian,
    )
    from multicam_calibration_tpu.ops.ba_pallas import _hilo, LANES

    def chunk_prep(cam_params, pose_k):
        N = objp.shape[0]
        intr_t = jnp.concatenate([cam_params[:, :6], cam_params[:, 9:12]], -1)
        ih, il = _hilo(intr_t)
        cam_pack = jnp.pad(jnp.stack([ih, il], -1).reshape(C, 18),
                           ((0, 0), (0, 6)))
        R_c = so3_exp(cam_params[:, 6:9])
        rch, rcl = _hilo(R_c.reshape(C, 9))
        rc_pack = jnp.concatenate([rch, rcl], -1)
        jlc = so3_left_jacobian(cam_params[:, 6:9]).astype(
            jnp.float32).reshape(C, 9)
        R_p = so3_exp(pose_k[:, :3])
        p_w = jnp.einsum("nj,fij->fni", objp, R_p) + pose_k[:, None, 3:]
        pwh, pwl = _hilo(p_w)

        def lanes(x):
            x = jnp.repeat(x.transpose(0, 2, 1), 2, axis=-1)
            return jnp.pad(x, ((0, 0), (0, 0), (0, LANES - 2 * N)))

        pw_pack = jnp.concatenate([lanes(pwh), lanes(pwl)], axis=1)
        posef = jnp.concatenate(
            [pose_k[:, 3:].astype(jnp.float32),
             so3_left_jacobian(pose_k[:, :3]).astype(jnp.float32).reshape(
                 -1, 9)], axis=-1)
        return (jnp.sum(cam_pack) + jnp.sum(rc_pack) + jnp.sum(jlc)
                + jnp.sum(pw_pack) + jnp.sum(posef))

    def scan_prep(cam, pose_c_):
        def body(carry, p):
            return carry + chunk_prep(cam, p).astype(jnp.float64), ()
        s, _ = lax.scan(body, jnp.zeros((), jnp.float64), pose_c_)
        return s

    w_chunkprep = t(jax.jit(scan_prep), cam0, pose_c)
    print(f"scan(chunk prep only):       {w_chunkprep*1e3:8.2f} ms",
          flush=True)
    print(f"=> kernel-only estimate:     {(w_full-w_chunkprep)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
