"""Experiment: G-fused block assembly vs the 3-einsum analytic path.

The analytic path materializes A (C,F,N,2,12) and B (C,F,N,2,6) and reads
them ~4x across the U/V/W/g einsums. The fused variant builds one
G = [A | B] (C,F,N,2,18), computes H = G^T G per (c,f) in ONE einsum
(plus one fused gradient einsum), and derives U/V/W by cheap reductions /
slices of H — trading the MXU-friendly big-K U/V contractions for a single
pass over G. Times both at config-5 chunk scale on the real TPU.

Usage: python scripts/exp_build_fuse.py [C F]
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

    from multicam_calibration_tpu.models.lm_core import (
        LMOptions,
        _analytic_pred_and_jacs,
        _robust_cost,
        _robust_weights,
        build_normal_blocks,
    )

    C, F = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (64, 20000)
    cam0_np, poses0_np, obs_np, mask_np, objp_np = get_problem(C, F)
    n_obs = int(mask_np.sum())
    print(f"=== {C} cams x {F} frames, {n_obs} obs ===", flush=True)

    dt = jnp.float32
    cam0 = jnp.asarray(cam0_np, dt)
    poses0 = jnp.asarray(poses0_np, dt)
    obs = jnp.asarray(obs_np, dt)
    mask = jnp.asarray(mask_np)
    objp = jnp.asarray(objp_np, dt)
    opts = LMOptions(frame_chunk=256)

    def lin_fused(cam_params, pose_k, obs_k, mask_k):
        pred, A, B = _analytic_pred_and_jacs(cam_params, pose_k, objp)
        m = mask_k[..., None]
        r = jnp.where(m, jnp.nan_to_num(obs_k) - pred, 0.0)
        w = jnp.where(m, _robust_weights(r**2, opts), 0.0)
        rho = _robust_cost(jnp.where(m, r**2, 0.0), opts, axis=(-2, -1))
        cost = jnp.sum(rho)
        G = jnp.concatenate([A, B], axis=-1)  # (C,Fk,N,2,18)
        Gw = jnp.where(m[..., None], G * w[..., None], 0.0)
        H = jnp.einsum("cfnki,cfnkj->cfij", Gw, Gw)  # (C,Fk,18,18)
        g = jnp.einsum("cfnki,cfnk->cfi", Gw, r * w)  # (C,Fk,18)
        U = H[..., :12, :12].sum(1)
        V = H[..., 12:, 12:].sum(0)
        W = H[..., :12, 12:]
        g_cam = g[..., :12].sum(1)
        g_pose = g[..., 12:].sum(0)
        return U, V, W, g_cam, g_pose, cost

    def build_fused(cam_params, pose_params, obs_, mask_):
        chunk = 256
        Fn = pose_params.shape[0]
        pad = (-Fn) % chunk
        nc = (Fn + pad) // chunk

        def pf(x, axis):
            if not pad:
                return x
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, pad)
            return jnp.pad(x, widths)

        pose_c = pf(pose_params, 0).reshape(nc, chunk, 6)
        obs_c = jnp.moveaxis(
            pf(obs_, 1).reshape(C, nc, chunk, *obs_.shape[2:]), 1, 0
        )
        mask_c = jnp.moveaxis(
            pf(mask_, 1).reshape(C, nc, chunk, *mask_.shape[2:]), 1, 0
        )

        def body(carry, xs):
            U_acc, g_acc, c_acc = carry
            U, V, W, g_cam, g_pose, cost = lin_fused(cam_params, *xs)
            return (U_acc + U, g_acc + g_cam, c_acc + cost), (V, W, g_pose)

        init = (
            jnp.zeros((C, 12, 12), dt),
            jnp.zeros((C, 12), dt),
            jnp.zeros((), dt),
        )
        (U, g_cam, cost), (V_s, W_s, gp_s) = lax.scan(
            body, init, (pose_c, obs_c, mask_c)
        )
        return U, V_s, W_s, g_cam, gp_s, cost

    def scalarize(tree):
        return sum(
            jnp.sum(leaf) for leaf in jax.tree.leaves(tree)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    def time_fn(fn, *args, reps=4):
        out = fn(*args)
        np.asarray(out)
        walls = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(*args))
            walls.append(time.time() - t0)
        return float(np.median(walls))

    fused = jax.jit(lambda c, p, o, m: scalarize(build_fused(c, p, o, m)))
    t_f = time_fn(fused, cam0, poses0, obs, mask)
    print(f"G-fused f32:   {t_f*1e3:9.2f} ms  obs/s={n_obs/t_f/1e6:8.1f} M",
          flush=True)

    base = jax.jit(
        lambda c, p, o, m: scalarize(
            build_normal_blocks(c, p, o, m, objp, opts)
        )
    )
    t_b = time_fn(base, cam0, poses0, obs, mask)
    print(f"3-einsum f32:  {t_b*1e3:9.2f} ms  obs/s={n_obs/t_b/1e6:8.1f} M",
          flush=True)


if __name__ == "__main__":
    main()
