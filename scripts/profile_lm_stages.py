"""Stage-level TPU timing + speed-of-light decomposition of the LM iteration.

Times build_normal_blocks (XLA and, on TPU, the fused Pallas kernel),
schur_solve, and compute_cost as separately-jitted programs at the given
problem scales, measures the per-program **dispatch floor** (this
container's remote-tunnel round-trip — the dominant term for small
problems), and classifies each stage latency- vs bandwidth- vs
compute-bound from simple byte/FLOP models. Writes LM_DECOMPOSITION.json
(the VERDICT r3 #4 artifact; summarized in docs/under_the_hood.md).

Usage: python scripts/profile_lm_stages.py [n_cameras n_frames ...]
Env: LM_PROFILE_FRAME_CHUNK=256 bounds the block build like config 5.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# TPU v5 lite (the bench chip): ~394 GB/s HBM, ~197 f32 TFLOP/s with the
# MXU, ~0.5 TFLOP/s-class VPU elementwise throughput per the public spec
# ratios. Emulated f64 charged at ~peak_f32/10 (utils/flops.py convention).
HBM_GBPS = 394.0
F32_TFLOPS = 197.0


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

    # Configs as "C F" pairs; F may carry a per-config frame chunk as
    # "F:chunk" (config 5 is 64 20000:256 — the sweep's memory-bounded
    # scan path). LM_PROFILE_FRAME_CHUNK is the global fallback.
    g_chunk = int(os.environ.get("LM_PROFILE_FRAME_CHUNK", "0")) or None
    cfgs = []
    args = sys.argv[1:]
    while args:
        fspec = args[1]
        if ":" in fspec:
            f_str, ck_str = fspec.split(":")
            cfgs.append((int(args[0]), int(f_str), int(ck_str)))
        else:
            cfgs.append((int(args[0]), int(fspec), g_chunk))
        args = args[2:]
    if not cfgs:
        cfgs = [(6, 1000, g_chunk)]

    platform = jax.default_backend()
    on_tpu = platform not in ("cpu",)

    # Dispatch floor: median wall of a trivial jitted scalar program —
    # every standalone stage timing below pays this once per call, so
    # device-time estimates subtract it. On this container the floor is
    # the remote-tunnel round trip, NOT device work.
    x_small = jnp.zeros((8, 128), jnp.float32)
    floor = time_fn(jax.jit(lambda x: jnp.sum(x) + 1.0), x_small, reps=9)
    print(f"dispatch floor: {floor*1e3:.2f} ms/program-call "
          f"({platform})", flush=True)

    records = {"platform": platform, "dispatch_floor_ms": round(floor * 1e3, 3),
               "hbm_gbps_model": HBM_GBPS, "f32_tflops_model": F32_TFLOPS,
               "configs": []}

    dtype = jnp.float64
    for C, F, frame_chunk in cfgs:
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
        base = dict(
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
        N = objp.shape[0]
        print(f"=== {C} cams x {F} frames, {n_obs} obs ===", flush=True)

        # ---- per-stage byte/FLOP models (dense over (C, F, N)) ----------
        # blocks: read obs f64 + per-obs chain ~500 f32 flops + analytic
        # A/B assembly ~300 + U/V/W contractions 2*(144+36+72) per obs-
        # component pair; writes V/W/g per frame. Bytes: obs in (CFN*2*8),
        # blocks out ((F*36 + C*F*(72+12+6) + C*144 + C*12) * 4).
        obs_bytes = C * F * N * 2 * 8
        blk_out_bytes = (F * 36 + C * F * 90 + C * 156) * 4
        blk_flops = C * F * N * 2 * (500 + 300 + 2 * (144 + 72 + 36 + 18))
        # schur: V^-1 (F*216), W V^-1 W^T (C^2*F*12*12*6*2), small dense
        # solve ((12C)^3/3), back-substitute; reads blocks, writes steps.
        schur_flops = F * 216 + (C * 12) ** 2 * F * 6 * 2 + (C * 12) ** 3 // 3
        schur_bytes = blk_out_bytes + (C * 12 + F * 6) * 8
        # cost: forward chain ~200 flops/obs-component; reads obs.
        cost_flops = C * F * N * 2 * 200
        cost_bytes = obs_bytes

        def classify(wall_s, flops, bytes_, f32=True):
            t_flop = flops / (F32_TFLOPS * 1e12 * (1.0 if f32 else 0.1))
            t_bw = bytes_ / (HBM_GBPS * 1e9)
            dev = max(wall_s - floor, 1e-6)
            bound = "latency" if wall_s < 2 * floor else (
                "bandwidth" if t_bw > t_flop else "compute")
            return {
                "wall_ms": round(wall_s * 1e3, 3),
                "device_ms_est": round(dev * 1e3, 3),
                "flop_model_ms": round(t_flop * 1e3, 4),
                "bw_model_ms": round(t_bw * 1e3, 4),
                "bound": bound,
                "sol_fraction": round(
                    max(t_flop, t_bw) / dev, 4
                ),
            }

        row = {"n_cameras": C, "n_frames": F, "n_obs": n_obs,
               "frame_chunk": frame_chunk, "stages": {}}

        # ---- block build: XLA path and (on TPU) the fused Pallas kernel -
        impls = ["xla"] + (["pallas"] if on_tpu and N * 2 <= 128 else [])
        t_blocks = {}
        for impl in impls:
            opts_i = LMOptions(block_impl=impl, **base)

            def blocks_scalar(cam, poses, obs_, mask_, objp_, o=opts_i):
                blocks = build_normal_blocks(cam, poses, obs_, mask_, objp_, o)
                return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(blocks)
                           if jnp.issubdtype(leaf.dtype, jnp.floating))

            t = time_fn(jax.jit(blocks_scalar), cam0, poses0, obs, mask, objp)
            t_blocks[impl] = t
            row["stages"][f"blocks_{impl}"] = classify(
                t, blk_flops, obs_bytes + blk_out_bytes
            )
            print(f"build_normal_blocks[{impl}]: {t*1e3:9.2f} ms "
                  f"({row['stages'][f'blocks_{impl}']['bound']}-bound, "
                  f"SoL {row['stages'][f'blocks_{impl}']['sol_fraction']:.1%})",
                  flush=True)

        opts = LMOptions(**base)
        blocks = jax.jit(functools.partial(build_normal_blocks, opts=opts))(
            cam0, poses0, obs, mask, objp
        )

        def schur_scalar(blocks_, lam):
            dcam, dpose = schur_solve(blocks_, lam, opts=opts)
            return jnp.sum(dcam) + jnp.sum(dpose)

        t_schur = time_fn(jax.jit(schur_scalar), blocks, 1e-4)
        row["stages"]["schur"] = classify(t_schur, schur_flops, schur_bytes)
        print(f"schur_solve:         {t_schur*1e3:9.2f} ms "
              f"({row['stages']['schur']['bound']}-bound)", flush=True)

        jit_cost = jax.jit(functools.partial(compute_cost, opts=opts))
        t_cost = time_fn(jit_cost, cam0, poses0, obs, mask, objp)
        row["stages"]["cost"] = classify(t_cost, cost_flops, cost_bytes)
        print(f"compute_cost:        {t_cost*1e3:9.2f} ms "
              f"({row['stages']['cost']['bound']}-bound)", flush=True)

        # Full solve for the per-iteration comparison (both impls on TPU,
        # plus the full-kernel recipe: fused cost eval per damping try —
        # nfev-n_iters extra cost programs the cost kernel can absorb).
        solve_impls = list(impls)
        if "pallas" in impls:
            solve_impls.append("pallas+cost")
        for impl in solve_impls:
            opts_i = LMOptions(
                block_impl="pallas" if impl == "pallas+cost" else impl,
                cost_impl="pallas" if impl == "pallas+cost" else "xla",
                **base,
            )
            out = lm_solve(cam0, poses0, obs, mask, objp, opts_i)
            jax_tree_materialize(out[:2])
            t0 = time.time()
            cam, poses_adj, info = lm_solve(cam0, poses0, obs, mask, objp,
                                            opts_i)
            n_iters = int(info["n_iters"])
            nfev = int(info["nfev"])
            jax_tree_materialize((cam, poses_adj))
            t_full = time.time() - t0
            per_iter = t_full / max(n_iters, 1)
            tries = nfev - 1
            t_blk_i = t_blocks["pallas" if impl == "pallas+cost" else impl]
            model = (
                n_iters * t_blk_i + tries * (t_schur + t_cost) + t_cost
            )
            row[f"lm_{impl}"] = {
                "wall_s": round(t_full, 4), "n_iters": n_iters, "nfev": nfev,
                "ms_per_iter": round(per_iter * 1e3, 3),
                "final_cost": round(float(info["final_cost"]), 2),
                "stage_sum_model_s": round(model, 4),
            }
            print(
                f"lm_solve[{impl}]: {t_full:.3f} s / {n_iters} iters "
                f"({per_iter*1e3:.1f} ms/iter, nfev {nfev}); "
                f"stage-sum model {model:.3f} s ({model/t_full:.0%} of "
                f"measured — >100% means the standalone stage walls are "
                f"dispatch-dominated)",
                flush=True,
            )
        records["configs"].append(row)

    out_path = os.path.join(REPO, "LM_DECOMPOSITION.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
