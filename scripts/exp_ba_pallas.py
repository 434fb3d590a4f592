"""Measure the fused Pallas block-build kernel on the real TPU.

Times one config-5-sized chunk (64 cams x 256 frames) and a full chunked
build through the kernel vs the XLA analytic path, and checks block parity
on-device.

Usage: python scripts/exp_ba_pallas.py [C Fk]
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

    from multicam_calibration_tpu.models.lm_core import (
        LMOptions,
        build_normal_blocks,
    )
    from multicam_calibration_tpu.ops.ba_pallas import (
        ba_chunk_blocks,
        ba_prepare_obs,
    )

    C, F = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (64, 20000)
    Fk = 256
    cam0_np, poses0_np, obs_np, mask_np, objp_np = get_problem(C, F)
    cam0 = jnp.asarray(cam0_np, jnp.float64)
    poses0 = jnp.asarray(poses0_np[:Fk], jnp.float64)
    obs = jnp.asarray(obs_np[:, :Fk], jnp.float64)
    mask = jnp.asarray(mask_np[:, :Fk])
    objp = jnp.asarray(objp_np, jnp.float64)
    n_obs = int(mask_np.sum())

    prep = jax.jit(ba_prepare_obs)
    obs_hi, obs_lo, msk = prep(obs, mask)
    np.asarray(obs_hi[0, 0, 0])

    def scalarize(tree):
        return sum(
            jnp.sum(leaf) for leaf in jax.tree.leaves(tree)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    kfn = jax.jit(
        lambda c, p, oh, ol, m: scalarize(
            ba_chunk_blocks(c, p, oh, ol, m, objp, interpret=False)
        )
    )
    t0 = time.time()
    out = kfn(cam0, poses0, obs_hi, obs_lo, msk)
    np.asarray(out)
    print(f"kernel chunk compile+run: {time.time()-t0:.1f} s", flush=True)
    walls = []
    for _ in range(6):
        t0 = time.time()
        np.asarray(kfn(cam0, poses0, obs_hi, obs_lo, msk))
        walls.append(time.time() - t0)
    w = float(np.median(walls))
    pts = C * Fk * objp.shape[0]
    print(
        f"kernel chunk ({C}x{Fk}): {w*1e3:8.2f} ms"
        f"  ({pts/w/1e6:.0f} M dense pts/s)",
        flush=True,
    )

    # Parity vs the XLA analytic path on this chunk.
    opts = LMOptions(
        jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
        cost_dtype="float32",
    )
    xla = jax.jit(
        lambda c, p, o, m: build_normal_blocks(c, p, o, m, objp, opts)
    )
    blocks = xla(cam0, poses0, obs, mask)
    U0 = np.asarray(blocks.U)
    kout = jax.jit(
        lambda c, p, oh, ol, m: ba_chunk_blocks(
            c, p, oh, ol, m, objp, interpret=False
        )
    )(cam0, poses0, obs_hi, obs_lo, msk)
    U = np.asarray(kout[0], np.float64)
    W0 = np.asarray(blocks.W)
    W = np.asarray(kout[2], np.float64)
    gp = np.asarray(kout[4], np.float64).sum(0)
    gp0 = np.asarray(blocks.g_pose)
    du = np.abs(U - U0).max() / max(np.abs(U0).max(), 1.0)
    dw = np.abs(W - W0).max() / max(np.abs(W0).max(), 1.0)
    dg = np.abs(gp - gp0).max() / max(np.abs(gp0).max(), 1.0)
    print(f"parity: dU={du:.2e} dW={dw:.2e} dg_pose={dg:.2e}", flush=True)

    t0 = time.time()
    b = xla(cam0, poses0, obs, mask)
    np.asarray(b.U)
    walls = []
    for _ in range(4):
        t0 = time.time()
        np.asarray(xla(cam0, poses0, obs, mask).U)
        walls.append(time.time() - t0)
    print(f"xla chunk:   {float(np.median(walls))*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
