"""Full-build comparison: fused Pallas kernel vs XLA analytic path.

Times build_normal_blocks over the full config-5 problem (64 cams x 20k
frames, frame_chunk=256, shipped f64+f32 recipe) with block_impl
"pallas" vs "xla" — one dispatch each, the scan amortizes the remote
tunnel's per-call latency. Also checks block parity on-device.

Usage: python scripts/exp_ba_pallas_full.py [C F]
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

    C, F = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (64, 20000)
    cam0_np, poses0_np, obs_np, mask_np, objp_np = get_problem(C, F)
    n_obs = int(mask_np.sum())
    print(f"=== {C} cams x {F} frames, {n_obs} obs ===", flush=True)

    cam0 = jnp.asarray(cam0_np, jnp.float64)
    poses0 = jnp.asarray(poses0_np, jnp.float64)
    obs = jnp.asarray(obs_np, jnp.float64)
    mask = jnp.asarray(mask_np)
    objp = jnp.asarray(objp_np, jnp.float64)

    def scalarize(tree):
        return sum(
            jnp.sum(leaf) for leaf in jax.tree.leaves(tree)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    walls = {}
    for impl in ("pallas", "xla"):
        opts = LMOptions(
            jac_dtype="float32", block_dtype="float32", cost_dtype="float32",
            solve_dtype="float32", grad_dtype="float32",
            lambda_escalation=3.0, frame_chunk=256, block_impl=impl,
        )
        fn = jax.jit(
            lambda c, p, o, m, _opts=opts: scalarize(
                build_normal_blocks(c, p, o, m, objp, _opts)
            )
        )
        t0 = time.time()
        np.asarray(fn(cam0, poses0, obs, mask))
        t_first = time.time() - t0
        ws = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(cam0, poses0, obs, mask))
            ws.append(time.time() - t0)
        w = float(np.median(ws))
        walls[impl] = w
        print(
            f"build {impl:7s}: {w*1e3:9.2f} ms  obs/s={n_obs/w/1e6:8.1f} M"
            f"  (first {t_first:.1f} s)",
            flush=True,
        )
    print(f"speedup pallas vs xla: {walls['xla']/walls['pallas']:.2f}x",
          flush=True)

    # Parity on one chunk worth of frames (cheap f64 compare via scalars).
    for impl in ("pallas", "xla"):
        opts = LMOptions(
            jac_dtype="float32", block_dtype="float32", cost_dtype="float32",
            grad_dtype="float32", frame_chunk=256, block_impl=impl,
        )
        b = jax.jit(
            lambda c, p, o, m, _opts=opts: build_normal_blocks(
                c, p, o[:, :256], m[:, :256], objp, _opts
            )
        )(cam0, poses0[:256], obs, mask)
        print(
            impl, "U[0,0,0]=", float(np.asarray(b.U)[0, 0, 0]),
            "cost=", float(np.asarray(b.cost)),
            flush=True,
        )


if __name__ == "__main__":
    main()
