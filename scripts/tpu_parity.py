"""On-hardware validation battery for TPU codepaths.

The round-3 lesson: interpret-mode Pallas tests pass while the compiled
Mosaic kernel diverges on the real chip (BENCH_r03: the auto-selected
kernel produced non-descent steps; the solver exited at its starting
point). This script is the gate that hardware defaults must pass ON THE
REAL CHIP before any `block_impl="auto"` routing may select a kernel:

  1. **Block parity**: the compiled (interpret=False) fused BA kernel
     (ops/ba_pallas.py) vs the XLA analytic path, same data, same device,
     per-output max-error table at the interpret-test tolerances.
  2. **Descent**: a full `lm_solve` through the kernel on the bench-scale
     problem must converge to the XLA path's cost (rtol 1e-3).
  3. **XLA sanity**: the shipped default recipe must itself descend.

Writes TPU_PARITY.json {git_commit, results, pass} — the artifact a
hardware-default flip must cite. Exit 0 iff every check passes.

Usage:  python scripts/tpu_parity.py [--frames 256] [--skip-descent]
Repo rule (CLAUDE.md): any commit touching a TPU codepath carries a
BENCH_LAST.json produced by that commit's code; flipping a kernel to
default additionally requires a passing TPU_PARITY.json from the same
code.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _alarm(signum, frame):
    raise TimeoutError("axon backend init/compile timed out")


def build_problem(n_frames):
    """The bench workload (6cam x 35pt synthetic rig, calibrated x0),
    truncated to n_frames — identical construction to bench.py."""
    import jax
    import jax.numpy as jnp

    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.models.bundle_adjustment import (
        _params_to_arrays,
    )

    rig = mct.make_synthetic_rig(
        n_cameras=6, n_frames=1000, noise_px=0.3, dropout=0.25, seed=11
    )
    with jax.default_device(jax.devices("cpu")[0]):
        ext, intr, poses, _ = mct.calibrate(
            rig.all_calib_uvs, rig.img_sizes, rig.calib_objpoints,
            verbose=False, n_samples_for_intrinsics=50,
        )
    prob = np.load(os.path.join(REPO, "BASELINE_PROBLEM.npz"))
    use = prob["use_frames"][:n_frames]
    obs_np = rig.all_calib_uvs[:, use]
    cam = jnp.asarray(_params_to_arrays(ext, intr), jnp.float64)
    poses0 = jnp.asarray(np.nan_to_num(np.asarray(poses)[use]), jnp.float64)
    obs = jnp.asarray(np.nan_to_num(obs_np), jnp.float64)
    mask = jnp.asarray(~np.isnan(obs_np).any(-1))
    objp = jnp.asarray(rig.calib_objpoints, jnp.float64)
    return cam, poses0, obs, mask, objp


def check_block_parity(cam, poses, obs, mask, objp, results, interpret=False):
    """Compiled-Mosaic kernel vs the XLA analytic oracle, on-device."""
    import jax
    import jax.numpy as jnp

    from multicam_calibration_tpu.models.lm_core import (
        LMOptions, _linearize_analytic,
    )
    from multicam_calibration_tpu.ops.ba_pallas import (
        ba_chunk_blocks, ba_prepare_obs,
    )
    from multicam_calibration_tpu.ops.precision import with_highest_precision

    opts = LMOptions(
        jac_dtype="float32", block_dtype="float32", grad_dtype="float32",
        cost_dtype="float32",
    )

    # with_highest_precision is load-bearing for the ORACLE on TPU: outside
    # lm_solve's context its f32 einsums lower to single-pass bf16 MXU
    # matmuls (~0.5% error) and the oracle — not the kernel — diverges.
    @jax.jit
    @with_highest_precision
    def oracle(cam, poses, obs, mask, objp):
        return _linearize_analytic(cam, poses, obs, mask, objp, opts)

    @jax.jit
    def kernel(cam, poses, obs, mask, objp):
        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
        return ba_chunk_blocks(
            cam, poses, obs_hi, obs_lo, msk, objp, tile_f=64,
            interpret=interpret,
        )

    t0 = time.time()
    U0, V0, W0, gc0, gp0, cost0 = [np.asarray(x, np.float64)
                                   for x in oracle(cam, poses, obs, mask, objp)]
    t_oracle = time.time() - t0
    t0 = time.time()
    U, V, W, gc, gp, cost = [np.asarray(x, np.float64)
                             for x in kernel(cam, poses, obs, mask, objp)]
    t_kernel = time.time() - t0

    # Caller-side reductions the kernel contract defers (f64 frame/camera
    # sums of the per-(c,f) f32 fragments).
    gc_r, gp_r, cost_r = gc.sum(1), gp.sum(0), cost.sum()

    checks = {}

    def diff(name, a, b, tol_scale, tol=2e-5):
        scale = max(np.abs(b).max(), tol_scale)
        err = float(np.abs(a - b).max() / scale)
        checks[name] = {"rel_err": err, "tol": tol, "ok": bool(err <= tol)}
        return checks[name]["ok"]

    ok = True
    ok &= diff("U", U, U0, 1.0)
    ok &= diff("V", V, V0, 1.0)
    ok &= diff("W", W, W0, 1.0)
    ok &= diff("g_cam", gc_r, gc0, 1.0, tol=3e-5)
    ok &= diff("g_pose", gp_r, gp0, 1.0, tol=3e-5)
    checks["cost"] = {
        "rel_err": float(abs(cost_r - cost0) / abs(cost0)),
        "tol": 3e-5,
        "ok": bool(abs(cost_r - cost0) <= 3e-5 * abs(cost0)),
    }
    ok &= checks["cost"]["ok"]
    results["block_parity"] = {
        "ok": bool(ok), "checks": checks,
        "wall_oracle_s": round(t_oracle, 3),
        "wall_kernel_s": round(t_kernel, 3),
    }
    for name, c in checks.items():
        print(f"  {name:8s} rel_err {c['rel_err']:.3e}  "
              f"{'OK' if c['ok'] else 'FAIL'} (tol {c['tol']:.0e})")
    return ok


def check_cost_parity(cam, poses, obs, mask, objp, results):
    """Compiled cost-only kernel vs the f64 robust cost, on-device."""
    import jax
    import jax.numpy as jnp

    from multicam_calibration_tpu.models.lm_core import (
        LMOptions, compute_cost,
    )
    from multicam_calibration_tpu.ops.ba_pallas import (
        ba_chunk_cost, ba_prepare_obs,
    )

    opts64 = LMOptions()  # pure-f64 oracle cost

    @jax.jit
    def oracle(cam, poses):
        return compute_cost(cam, poses, obs, mask, objp, opts64)

    @jax.jit
    def kernel(cam, poses):
        obs_hi, obs_lo, msk = ba_prepare_obs(obs, mask)
        return ba_chunk_cost(
            cam, poses, obs_hi, obs_lo, msk, objp, tile_f=64
        ).astype(jnp.float64).sum()

    c0 = float(np.asarray(oracle(cam, poses)))
    c = float(np.asarray(kernel(cam, poses)))
    err = abs(c - c0) / abs(c0)
    ok = err <= 3e-5
    results["cost_parity"] = {
        "kernel": c, "oracle_f64": c0, "rel_err": err, "tol": 3e-5,
        "ok": bool(ok),
    }
    print(f"  cost     kernel {c:.4f} vs f64 {c0:.4f} rel {err:.3e}  "
          f"{'OK' if ok else 'FAIL'}")

    # Standalone-jitted f32-projected XLA cost: guards compute_cost's OWN
    # precision context. bench.py's quality gate jits compute_cost outside
    # lm_solve's highest-precision scope; if the decorator is lost, the
    # MXU truncates the f32 projections to bf16 and the reported cost
    # inflates ~12x (shipped once in round 4: a helper inserted between
    # the decorator and the def silently re-targeted it).
    opts32 = LMOptions(cost_dtype="float32")

    @jax.jit
    def standalone32(cam, poses):
        return compute_cost(cam, poses, obs, mask, objp, opts32)

    c32 = float(np.asarray(standalone32(cam, poses)))
    err32 = abs(c32 - c0) / abs(c0)
    ok32 = err32 <= 1e-3  # f32 projection granularity; bf16 would be ~11x
    results["cost_parity"]["standalone_f32_xla"] = {
        "value": c32, "rel_err": err32, "tol": 1e-3, "ok": bool(ok32),
    }
    print(f"  f32-cost standalone {c32:.4f} vs f64 {c0:.4f} rel "
          f"{err32:.3e}  {'OK' if ok32 else 'FAIL'}")
    return ok and ok32


def check_descent(cam, poses, obs, mask, objp, results, impl):
    """Full LM through `impl` must descend and (for pallas) match XLA.

    The start point carries bench.py's timed-run perturbation (+3e-5 on
    every camera param): it knocks the gauge-root camera off exact
    identity, the configuration whose padded-frame z values broke the
    round-4 kernel while every exact-identity descent passed.
    """
    import jax.numpy as jnp

    from multicam_calibration_tpu.models.lm_core import LMOptions, lm_solve

    cam = cam + jnp.asarray(3e-5, cam.dtype)
    # impl="pallas+cost" runs BOTH fused kernels (block build + per-try
    # cost evaluation) — the full-kernel recipe a certified auto routing
    # would select.
    opts = LMOptions(
        jac_dtype="float32", block_dtype="float32", cost_dtype="float32",
        solve_dtype="float32", grad_dtype="float32",
        lambda_escalation=3.0, gtol_rel=1e-6,
        block_impl="pallas" if impl == "pallas+cost" else impl,
        cost_impl="pallas" if impl == "pallas+cost" else "xla",
    )
    t0 = time.time()
    cam_a, poses_a, info = lm_solve(cam, poses, obs, mask, objp, opts)
    final = float(np.asarray(info["final_cost"]))
    n_iters = int(np.asarray(info["n_iters"]))
    nfev = int(np.asarray(info["nfev"]))
    wall = time.time() - t0
    start = float(np.asarray(info["history"])[0, 0])
    rec = {
        "impl": impl, "start_cost": start, "final_cost": final,
        "n_iters": n_iters, "nfev": nfev,
        "wall_s_incl_compile": round(wall, 3),
        # Strict decrease beyond noise — the warm-started slices used for
        # quick runs may legitimately start near the optimum.
        "descended": bool(final < 0.999 * start),
    }
    results.setdefault("descent", {})[impl] = rec
    print(f"  {impl:6s} cost {start:.2f} -> {final:.2f} in {n_iters} iters "
          f"(nfev {nfev}), {'OK' if rec['descended'] else 'FAIL'}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    # NOT a multiple of the kernel's 64-frame tile, deliberately: frame
    # padding is part of the contract under test (the round-4 bench
    # failure was padded-frame NaNs that a padding-free slice cannot see).
    ap.add_argument("--frames", type=int, default=250,
                    help="frames for the block-parity slice")
    ap.add_argument("--descent-frames", type=int, default=922)
    ap.add_argument("--skip-descent", action="store_true")
    ap.add_argument("--init-alarm", type=int, default=240)
    ap.add_argument("--run-alarm", type=int, default=3000)
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(args.init_alarm)
    import jax

    if os.environ.get("MCC_PARITY_FORCE_CPU"):
        # Smoke-testing the script itself (certifies nothing; the
        # JAX_PLATFORMS env var is ignored on this rig — sitecustomize
        # forces axon — so the config update is the only way).
        jax.config.update("jax_platforms", "cpu")
    jax.devices()
    signal.alarm(args.run_alarm)
    jax.config.update("jax_enable_x64", True)

    platform = jax.default_backend()
    results = {
        "git_commit": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True,
            text=True,
        ).stdout.strip(),
        "platform": platform,
        "device_kind": jax.devices()[0].device_kind,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    if platform not in ("tpu", "axon"):
        print(f"tpu_parity: backend is '{platform}', not a TPU — this run "
              "does NOT certify hardware behavior", file=sys.stderr)
        results["certifies_hardware"] = False
    else:
        results["certifies_hardware"] = True

    print(f"tpu_parity on {platform} ({results['device_kind']}), "
          f"commit {results['git_commit'][:9]}")
    cam, poses, obs, mask, objp = build_problem(args.descent_frames)

    print(f"[1/5] block parity (compiled kernel vs XLA, "
          f"{args.frames} frames)")
    ok = check_block_parity(
        cam, poses[: args.frames], obs[:, : args.frames],
        mask[:, : args.frames], objp, results,
        interpret=not results["certifies_hardware"],
    )
    print(f"[2/5] cost-kernel parity ({args.frames} frames)")
    ok = check_cost_parity(
        cam, poses[: args.frames], obs[:, : args.frames],
        mask[:, : args.frames], objp, results,
    ) and ok

    if not args.skip_descent:
        print(f"[3/5] XLA descent ({args.descent_frames} frames)")
        rec_x = check_descent(cam, poses, obs, mask, objp, results, "xla")
        ok = ok and rec_x["descended"]
        print(f"[4/5] Pallas descent ({args.descent_frames} frames)")
        rec_p = check_descent(cam, poses, obs, mask, objp, results, "pallas")
        match = bool(
            rec_p["final_cost"] <= rec_x["final_cost"] * (1 + 1e-3)
        )
        results["descent"]["pallas_matches_xla"] = match
        print(f"  pallas final {rec_p['final_cost']:.2f} vs xla "
              f"{rec_x['final_cost']:.2f}: {'OK' if match else 'FAIL'}")
        ok = ok and rec_p["descended"] and match
        print(f"[5/5] Pallas+cost descent ({args.descent_frames} frames)")
        rec_pc = check_descent(
            cam, poses, obs, mask, objp, results, "pallas+cost"
        )
        match_pc = bool(
            rec_pc["final_cost"] <= rec_x["final_cost"] * (1 + 1e-3)
        )
        results["descent"]["pallas_cost_matches_xla"] = match_pc
        print(f"  pallas+cost final {rec_pc['final_cost']:.2f} vs xla "
              f"{rec_x['final_cost']:.2f}: {'OK' if match_pc else 'FAIL'}")
        ok = ok and rec_pc["descended"] and match_pc

    results["pass"] = bool(ok)
    out = os.path.join(REPO, "TPU_PARITY.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"tpu_parity: {'PASS' if ok else 'FAIL'} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
