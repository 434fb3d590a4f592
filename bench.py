"""Benchmark: Schur-LM bundle adjustment vs the measured reference baseline.

Runs the flagship workload (6-camera rig, N=35-point board) on the default
JAX platform (the real TPU chip under the driver; CPU if forced) and prints
ONE JSON line:

    {"metric": "ba_lm_iterations_per_s", "value": ..., "unit": "iter/s",
     "vs_baseline": ...}

vs_baseline is the end-to-end BA wall-clock speedup over the reference's
scipy-TRF solver measured on this machine's CPU for the same synthetic
workload (scripts/measure_reference_baseline.py -> BASELINE_MEASURED.json);
the reference publishes no numbers of its own (BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CAMERAS = 6
N_FRAMES = 1000
SEED = 11


def main():
    import signal

    import jax

    if os.environ.get("MCC_BENCH_FORCE_CPU"):
        # Last-resort fallback after repeated remote-TPU backend failures
        # (see __main__): record an honest CPU result rather than none.
        jax.config.update("jax_platforms", "cpu")

    # Watchdogs: the remote axon backend's observed failure mode is an
    # INDEFINITE HANG (backend init or compile never returns — seen
    # 2026-08-17, multi-hour outage), which no exception-based retry can
    # catch. SIGALRM turns a hang into a transient TimeoutError that the
    # __main__ retry/CPU-fallback ladder handles.
    def _alarm(signum, frame):
        raise TimeoutError("backend init/compile timed out (axon unreachable)")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("MCC_BENCH_INIT_ALARM", "240")))
    jax.devices()
    # Whole-run budget (parent window minus a margin so the in-process
    # TimeoutError — which produces a useful message — fires before the
    # parent's SIGKILL).
    signal.alarm(int(os.environ.get("MCC_BENCH_RUN_ALARM", "840")))

    # f64 end-to-end: the damped BA system needs f64 step accuracy to reach
    # the reference's cost basin reliably — f32 trajectories stall at
    # compile-dependent shelves of the soft-L1 valley (observed 6x final-
    # cost spread across otherwise-identical runs; see lm_core.schur_solve
    # docstring and test_calibration.py::test_f32_solver_quality). XLA:TPU
    # emulates f64 at ~18x the f32 step cost, still ~800x the reference's
    # wall-clock, and reproduces its RMSE to 4 decimals.
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.models.bundle_adjustment import _params_to_arrays
    from multicam_calibration_tpu.models.lm_core import LMOptions, lm_solve

    dtype = jnp.float64

    rig = mct.make_synthetic_rig(
        n_cameras=N_CAMERAS, n_frames=N_FRAMES, noise_px=0.3, dropout=0.25,
        seed=SEED,
    )
    # Identical init path to the baseline measurement (scripts/...): both
    # solvers start from the same x0 and run to the same ftol.
    with jax.default_device(jax.devices("cpu")[0]):
        ext, intr, poses, _ = mct.calibrate(
            rig.all_calib_uvs, rig.img_sizes, rig.calib_objpoints,
            verbose=False, n_samples_for_intrinsics=50,
        )
    # The EXACT frame set the measured reference run solved
    # (BASELINE_PROBLEM.npz, written by scripts/measure_reference_baseline.py
    # from the reference's own in-solver selection) so the cost comparison is
    # on the identical problem; fall back to our equivalent selection rules
    # if the problem file is absent.
    problem_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_PROBLEM.npz"
    )
    use_frames = None
    identical_problem = False
    if os.path.exists(problem_path):
        prob = np.load(problem_path)
        if (
            int(prob["n_cameras"]) == N_CAMERAS
            and int(prob["n_frames"]) == N_FRAMES
            and int(prob["seed"]) == SEED
        ):
            use_frames = prob["use_frames"]
            identical_problem = True
    if use_frames is None:
        from multicam_calibration_tpu.models.bundle_adjustment import (
            select_ba_frames,
        )

        use_frames = select_ba_frames(
            rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
            n_frames=None, verbose=False,
        )
    obs_np = rig.all_calib_uvs[:, use_frames]
    mask_np = ~np.isnan(obs_np).any(-1)
    cam0 = jnp.asarray(_params_to_arrays(ext, intr), dtype=dtype)
    poses0 = jnp.asarray(
        np.nan_to_num(np.asarray(poses)[use_frames]), dtype=dtype
    )
    obs = jnp.asarray(np.nan_to_num(obs_np), dtype=dtype)
    mask = jnp.asarray(mask_np)
    objp = jnp.asarray(rig.calib_objpoints, dtype=dtype)

    # Reference-equivalent options (soft_l1, ftol=1e-4) in the TPU mixed
    # recipe: f64 residual/gradient path (what anchors the optimum) with
    # f32 Jacobians, J^T J blocks, Schur solve, and per-try cost
    # projections (all emulation-dominated on TPU). Measured on the bench
    # problem: same-or-deeper final cost than pure f64 (12330.851 vs
    # 12330.859) at ~2.4x less wall.
    opts = LMOptions(
        jac_dtype="float32",
        block_dtype="float32",
        cost_dtype="float32",
        solve_dtype="float32",
        # Escalating rejection multiplier: same converged cost, 26% less
        # wall (0.423 -> 0.312 s measured; end-game damping rounds reach a
        # workable lambda in half the tries).
        lambda_escalation=3.0,
        grad_dtype="float32",
        gtol_rel=1e-6,
    )

    # Warm-up (compile) ...
    out = lm_solve(cam0, poses0, obs, mask, objp, opts)
    _ = np.asarray(out[0])
    # ... then timed runs (compile excluded). Each run perturbs the starting
    # point slightly so no layer (including this container's remote-execution
    # relay) can short-circuit a repeated identical computation; all outputs
    # are materialized to host before the clock stops. (The outlier-pose
    # repair pass in bundle_adjust is a no-op on the f64 path — f64 LM does
    # not strand poses — so it is not exercised here.)
    walls, iters = [], []
    for k in range(3):
        cam_k = cam0 + jnp.asarray(1e-5, dtype) * (k + 1)
        t0 = time.time()
        cam, poses_adj, info = lm_solve(cam_k, poses0, obs, mask, objp, opts)
        n_iters = int(info["n_iters"])  # device->host sync
        _ = np.asarray(cam)
        _ = np.asarray(poses_adj)
        walls.append(time.time() - t0)
        iters.append(n_iters)
    wall = float(np.median(walls))
    n_iters = iters[int(np.argsort(walls)[len(walls) // 2])]
    iters_per_s = n_iters / wall

    # Quality gate: reprojection RMSE at the solution.
    pred_ext = np.asarray(cam[:, 6:12], dtype=np.float64)
    intr_out = [
        (
            np.array(
                [[c[0], 0, c[2]], [0, c[1], c[3]], [0, 0, 1.0]]
            ),
            np.array([c[4], c[5], 0, 0, 0]),
        )
        for c in np.asarray(cam, dtype=np.float64)
    ]
    pred = np.asarray(
        mct.predict_calib_uvs(
            pred_ext, intr_out, rig.calib_objpoints,
            np.asarray(poses_adj, dtype=np.float64),
        )
    )
    err = np.linalg.norm(obs_np - pred, axis=-1)
    rmse = float(np.sqrt(np.nanmean(np.where(mask_np, err, np.nan) ** 2)))
    from multicam_calibration_tpu.models.bundle_adjustment import _jit_cost

    final_cost = float(_jit_cost(cam, poses_adj, obs, mask, objp, opts))

    # Speed-of-light accounting: analytic FLOP model for the measured run
    # (utils/flops.py), achieved FLOP/s, and the roofline fraction = (time a
    # perfect machine would need for the same FLOPs, with f64 emulation
    # charged at ~peak_f32/10) / measured wall.
    from multicam_calibration_tpu.models.lm_core import _pallas_block_build
    from multicam_calibration_tpu.utils.flops import lm_flops_detail

    nfev = int(info["nfev"])
    # Bucket by the dtype each component runs in under `opts` (the mixed
    # recipe runs jac + assembly + schur + cost in f32; the f64 remainder
    # is the primal projection + gradient path).
    flops_detail = lm_flops_detail(
        N_CAMERAS, len(use_frames), 35, n_iters, nfev, wall,
        jax.devices()[0].device_kind, n_obs=int(mask_np.sum()),
        jacobian=opts.jacobian, mixed_f32=True,
    )

    vs_baseline = 0.0
    quality_ok = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        cases = json.load(open(base_path))["cases"]
        match = [
            c for c in cases
            if c["n_cameras"] == N_CAMERAS and c["n_frames_requested"] == N_FRAMES
        ]
        if match:
            # End-to-end wall-clock speedup at matched-or-better convergence
            # quality. On the identical problem (same frames, same x0 — the
            # BASELINE_PROBLEM path) the gate is strict: our converged cost
            # must be <= the reference solver's. Our LM runs the gradient to
            # ~0 where scipy stops on ftol in the soft-L1 valley, so "beat"
            # here is real, not tolerance slack. Without the problem file the
            # frame sets can differ by threshold flips and costs are not
            # directly comparable — fall back to the 5% proportional gate.
            ref = match[-1]
            if identical_problem:
                quality_ok = bool(final_cost <= ref["cost"])
            else:
                quality_ok = bool(final_cost <= ref["cost"] * 1.05)
            vs_baseline = ref["wall_s"] / wall if quality_ok else 0.0

    here = os.path.dirname(os.path.abspath(__file__))
    platform = jax.default_backend()
    # Outage insurance (r4 lesson: the driver's official record was an
    # honest CPU fallback because axon was down at snapshot time, losing
    # the TPU number): every record is commit-stamped, every TPU run also
    # writes BENCH_LAST_TPU.json (never overwritten by CPU fallbacks), and
    # a CPU fallback embeds the freshest committed TPU record so the
    # fallback row still points at same-tree TPU evidence.
    last_tpu_record = None
    if platform == "cpu":
        for cand in ("BENCH_LAST_TPU.json", "BENCH_LAST.json"):
            try:
                with open(os.path.join(here, cand)) as f:
                    prev = json.load(f)
            except (OSError, ValueError):
                continue
            pdetail = prev.get("detail", {})
            if pdetail.get("platform") not in (None, "cpu"):
                last_tpu_record = {
                    "source": cand,
                    "git_commit": pdetail.get("git_commit"),
                    "platform": pdetail.get("platform"),
                    "wall_s": pdetail.get("wall_s"),
                    "value": prev.get("value"),
                    "vs_baseline": prev.get("vs_baseline"),
                    "quality_vs_ref_ok": pdetail.get("quality_vs_ref_ok"),
                    "block_impl": pdetail.get("block_impl"),
                }
                break

    result = {
        "metric": "ba_lm_iterations_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "workload": f"{N_CAMERAS}cam x {N_FRAMES}frames x 35pts",
            # wall_s is the cross-impl/cross-round comparable (end-to-end
            # solve wall to the converged optimum; vs_baseline = reference
            # wall / wall_s). iter/s is NOT comparable across block_impl:
            # the fused Pallas path converges in ~4x fewer, heavier
            # iterations than the XLA blocks (7 vs 27-31 on this problem),
            # so a LOWER iter/s can be a strictly faster solve.
            "wall_s": round(wall, 4),
            "n_iters": n_iters,
            "final_cost": round(final_cost, 2),
            "final_rmse_px": round(rmse, 4),
            "quality_vs_ref_ok": quality_ok,
            "identical_problem_to_ref": identical_problem,
            "n_frames_used": int(len(use_frames)),
            "platform": platform,
            "git_commit": _git_commit(),
            "flops": flops_detail,
            # Which block-build executed: the fused Pallas kernel (two-float
            # residual, in-VMEM Jacobians; ops/ba_pallas.py) on TPU with the
            # all-f32 recipe, the XLA analytic path otherwise.
            "block_impl": "pallas" if _pallas_block_build(
                opts, np.float64, objp
            ) else "xla",
        },
    }
    if last_tpu_record is not None:
        result["detail"]["last_tpu_record"] = last_tpu_record
    line = json.dumps(result)
    # Redundant local record (the driver captures stdout; BENCH_LAST.json
    # survives even if that capture is lost or the parent is killed after
    # this point). TPU runs also refresh BENCH_LAST_TPU.json, which CPU
    # fallbacks cite but never overwrite.
    targets = ["BENCH_LAST.json"]
    if platform != "cpu":
        targets.append("BENCH_LAST_TPU.json")
    for name in targets:
        try:
            last = os.path.join(here, name)
            with open(last + ".tmp", "w") as f:
                f.write(line + "\n")
            os.replace(last + ".tmp", last)
        except OSError:
            pass
    print(line)


def _git_commit():
    """Short commit hash of the tree this bench ran from (best effort)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip() or None
    except (OSError, subprocess.TimeoutExpired):
        return None


def _is_transient(exc):
    """Remote-TPU (axon) failures that a fresh process may not hit again:
    backend setup/compile UNAVAILABLE, dropped tunnel connections, compile
    service deadlines. Observed intermittently on this rig."""
    msg = f"{type(exc).__name__}: {exc}"
    needles = (
        "UNAVAILABLE",
        "Unavailable",
        "backend setup",
        "Unable to initialize backend",
        "DEADLINE",
        "Connection",
        "Socket closed",
        "timed out",
    )
    return any(n in msg for n in needles)


def _probe():
    """Cheap TPU liveness probe: backend init + one tiny f32 program,
    materialized to host. Completes in ~30-60 s when axon is healthy;
    hangs (and gets SIGKILLed by the parent) when it is down. Runs NO f64
    and none of the bench programs, so a pass means 'the tunnel answers',
    not 'the bench will be fast'."""
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("probe: backend init/compile timed out")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("MCC_BENCH_INIT_ALARM", "240")))
    import jax
    import jax.numpy as jnp

    jax.devices()
    x = jnp.ones((128, 128), jnp.float32)
    val = float(np.asarray((x @ x).sum()))
    sys.stderr.write(
        f"bench: probe ok ({jax.default_backend()}, {val:.0f})\n"
    )
    return 0


def _child():
    """One bench attempt in this process. The in-process SIGALRM watchdog
    is best-effort only (a hang inside a C/grpc call never returns to the
    bytecode loop, so the Python handler cannot run — observed during the
    2026-08-17 axon outage); the PARENT's subprocess SIGKILL is the real
    defense."""
    try:
        if os.environ.get("MCC_BENCH_PROBE"):
            return _probe()
        main()
        return 0
    except Exception as e:  # noqa: BLE001 - last line of defense
        if not _is_transient(e):
            raise
        sys.stderr.write(f"bench: transient backend failure: {e}\n")
        return 17  # transient: the parent ladder decides what to try next


def _attempt(extra_env, tmo, label):
    """Run one killable child attempt; returns its rc (124 on timeout).
    subprocess.run(timeout=...) SIGKILLs the child on expiry, which is the
    only thing that reliably stops a C-level hang."""
    import subprocess

    env = dict(os.environ, MCC_BENCH_CHILD="1", **extra_env)
    try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, timeout=tmo
        ).returncode
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench: {label} timed out after {tmo}s (killed)\n")
        rc = 124
    if rc not in (0, 17, 124):
        sys.stderr.write(f"bench: {label} failed hard (rc={rc})\n")
    return rc


if __name__ == "__main__":
    if os.environ.get("MCC_BENCH_CHILD"):
        sys.exit(_child())

    # Parent watchdog ladder, restructured after round 2 recorded NOTHING
    # (the generous 1800s+600s TPU retries on a down axon blew the driver's
    # budget before the CPU fallback started — BENCH_r02.json rc=124):
    #
    #   1. PROBE  (<=300 s): tiny f32 program on the default backend. The
    #      axon failure mode is an indefinite hang, so a cheap liveness
    #      check is the only safe way to decide whether the full attempt
    #      is worth its window.
    #   2. FULL   (<=900 s): the real bench, only if the probe passed.
    #   3. CPU    (<=600 s): honest platform=cpu fallback (measured ~170 s
    #      end-to-end) whenever 1 or 2 failed. ALWAYS records a result.
    #
    # Worst case 300+300+900+600 = 35 min, inside the driver budget;
    # healthy case ~60 s probe + full run. Every success also writes
    # BENCH_LAST.json (see main()). The probe retries once: r5 observed
    # axon flaps SHORTER than one probe window (a probe timed out at
    # 10:14 while a patient run at 10:50 succeeded) — one cheap retry
    # converts those into TPU records instead of CPU fallbacks.
    rc = _attempt({"MCC_BENCH_PROBE": "1"}, 300, "probe")
    if rc != 0:
        rc = _attempt({"MCC_BENCH_PROBE": "1"}, 300, "probe retry")
    if rc == 0:
        rc = _attempt(
            {"MCC_BENCH_INIT_ALARM": "240", "MCC_BENCH_RUN_ALARM": "840"},
            900,
            "tpu attempt",
        )
        if rc == 0:
            sys.exit(0)
    rc = _attempt(
        {
            "MCC_BENCH_FORCE_CPU": "1",
            "MCC_BENCH_INIT_ALARM": "120",
            "MCC_BENCH_RUN_ALARM": "540",
        },
        600,
        "cpu fallback",
    )
    sys.exit(rc)
