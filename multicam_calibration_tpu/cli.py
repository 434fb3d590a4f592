"""Command-line interface: detect / calibrate / adjust / export / flatibrate /
benchmark.

The reference has no CLI (SURVEY.md §1 — its entry point is a tutorial
notebook). This provides the same pipeline as composable commands over the
HDF5 detection caches and the three calibration export formats.

Usage examples::

    python -m multicam_calibration_tpu.cli detect cam*.mp4 --board 5 7 \
        --square-size 12.5
    python -m multicam_calibration_tpu.cli calibrate cam*.mp4 --output calib.json
    python -m multicam_calibration_tpu.cli benchmark --n-cameras 6 --n-frames 1000
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from .utils.config import PipelineConfig, load_config


def _add_board_args(p):
    p.add_argument("--board", nargs=2, type=int, default=None,
                   metavar=("ROWS", "COLS"), help="interior corners (rows cols)")
    p.add_argument("--square-size", type=float, default=None, help="square size (mm)")
    p.add_argument("--config", default=None, help="YAML config path")


def _config_from_args(args):
    cfg = load_config(args.config) if args.config else PipelineConfig()
    if getattr(args, "board", None):
        cfg.board.shape = tuple(args.board)
    if getattr(args, "square_size", None):
        cfg.board.square_size = args.square_size
    return cfg


def _load_detections(video_paths, cfg, overwrite=False):
    from .detection import detect_chessboard, run_calibration_detection

    options = {
        "board_shape": tuple(cfg.board.shape),
        "scale_factor": cfg.detection.scale_factor,
        "match_score_min_diff": cfg.detection.match_score_min_diff,
        "max_candidates": cfg.detection.max_candidates,
        "nms_radius": cfg.detection.nms_radius,
        "reorder": cfg.detection.reorder,
    }
    return run_calibration_detection(
        video_paths, detect_chessboard, options, overwrite=overwrite
    )


def cmd_detect(args):
    cfg = _config_from_args(args)
    uvs, img_sizes = _load_detections(args.videos, cfg, overwrite=args.overwrite)
    n_det = (~np.isnan(uvs).any((-1, -2))).sum(1)
    for path, n in zip(args.videos, n_det):
        print(f"{path}: {n} frames with detections")
    return 0


def _enable_x64():
    """Reference-grade BA accuracy needs f64 residuals (lm_core.LMOptions);
    bundle_adjust then auto-selects f64 data + f32 Jacobians."""
    import jax

    jax.config.update("jax_enable_x64", True)


def cmd_calibrate(args):
    _enable_x64()
    from . import (
        bundle_adjust,
        calibrate,
        compute_residual_metric,
        generate_chessboard_objpoints,
        save_calibration,
    )

    cfg = _config_from_args(args)
    uvs, img_sizes = _load_detections(args.videos, cfg, overwrite=args.overwrite)
    objpoints = generate_chessboard_objpoints(
        tuple(cfg.board.shape), cfg.board.square_size
    )
    ext, intr, poses, tree = calibrate(
        uvs, img_sizes, objpoints,
        root=cfg.init.root_camera,
        n_samples_for_intrinsics=cfg.init.n_samples_for_intrinsics,
    )
    if not args.no_adjust:
        ext, intr, poses_adj, use_frames, info = bundle_adjust(
            uvs, ext, intr, objpoints, poses,
            n_frames=cfg.ba.n_frames,
            outlier_threshold=cfg.ba.outlier_threshold,
            ftol=cfg.ba.ftol,
            loss=cfg.ba.loss,
            max_iters=cfg.ba.max_iters,
            frame_chunk=cfg.ba.frame_chunk,
        )
        med, _, _ = compute_residual_metric(
            uvs[:, use_frames], ext, intr, objpoints, poses_adj
        )
        print("median reprojection error (board units):",
              np.round(med, 4).tolist())
    names = [
        os.path.splitext(os.path.basename(v))[0] for v in args.videos
    ]
    save_calibration(ext, intr, names, args.output, save_format=args.format)
    print(f"saved calibration to {args.output} ({args.format})")
    return 0


def cmd_adjust(args):
    """Re-run bundle adjustment from a saved calibration + detection caches."""
    _enable_x64()
    from . import (
        bundle_adjust,
        consensus_calib_poses,
        estimate_pose,
        generate_chessboard_objpoints,
        load_calibration,
        save_calibration,
    )

    cfg = _config_from_args(args)
    uvs, img_sizes = _load_detections(args.videos, cfg)
    objpoints = generate_chessboard_objpoints(
        tuple(cfg.board.shape), cfg.board.square_size
    )
    ext, intr, names = load_calibration(args.calibration, load_format=args.format)
    all_poses = np.stack(
        [np.asarray(estimate_pose(uvs[c], objpoints, *intr[c]))
         for c in range(len(ext))]
    )
    poses = np.asarray(consensus_calib_poses(all_poses, np.asarray(ext)))
    ext2, intr2, poses2, use_frames, info = bundle_adjust(
        uvs, np.asarray(ext), intr, objpoints, poses,
        n_frames=cfg.ba.n_frames, ftol=cfg.ba.ftol, max_iters=cfg.ba.max_iters,
        frame_chunk=cfg.ba.frame_chunk,
        checkpoint_path=getattr(args, "checkpoint", None),
    )
    save_calibration(ext2, intr2, names, args.output, save_format=args.format)
    print(f"saved adjusted calibration to {args.output}")
    if getattr(args, "uncertainty", False):
        from . import calibration_uncertainty

        unc = calibration_uncertainty(
            uvs[:, use_frames], ext2, intr2, objpoints, poses2
        )
        print(
            f"observation noise: {unc['sigma_px']:.3f} px "
            f"(dof {unc['dof']:.0f})"
        )
        sd = unc["camera_sd"]
        for c, name in enumerate(names):
            print(
                f"  {name}: fx±{sd[c, 0]:.2f} fy±{sd[c, 1]:.2f} "
                f"cx±{sd[c, 2]:.2f} cy±{sd[c, 3]:.2f} "
                f"k1±{sd[c, 4]:.4f} k2±{sd[c, 5]:.4f} "
                f"rot±{sd[c, 6:9].max():.2e} rad "
                f"trans±{sd[c, 9:12].max():.2f}"
            )
    return 0


def cmd_export(args):
    """Convert a calibration between formats."""
    from . import load_calibration, save_calibration

    ext, intr, names = load_calibration(args.input, load_format=args.from_format)
    save_calibration(ext, intr, names, args.output, save_format=args.to_format)
    print(f"converted {args.input} ({args.from_format}) -> {args.output} "
          f"({args.to_format})")
    return 0


def cmd_flatibrate(args):
    import h5py

    from . import center_arena, flatibrate, flip_z_axis, get_floor_points

    with h5py.File(args.keypoints, "r") as h5:
        keypoints = h5[args.dataset][:]
    floor = get_floor_points(keypoints, z_points_down=args.z_down)
    t = flatibrate(floor, residual_threshold=args.residual_threshold)
    if args.center:
        t = center_arena(t, floor)
    if args.flip_z:
        t = flip_z_axis(t)
    np.save(args.output, np.asarray(t))
    print(f"saved flatibration transform to {args.output}")
    return 0


def cmd_benchmark(args):
    """Synthetic-rig benchmark at arbitrary scale (see also bench.py)."""
    import time

    import jax

    # Match bench.py's validated numerics: f64 data + f32 Jacobians (pure
    # f32 stalls at compile-dependent shelves; see lm_core.LMOptions).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from . import calibrate, make_synthetic_rig
    from .models.bundle_adjustment import _params_to_arrays
    from .models.lm_core import LMOptions, lm_solve

    rig = make_synthetic_rig(
        n_cameras=args.n_cameras, n_frames=args.n_frames,
        noise_px=0.3, dropout=0.25, seed=args.seed,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        ext, intr, poses, _ = calibrate(
            rig.all_calib_uvs, rig.img_sizes, rig.calib_objpoints,
            verbose=False, n_samples_for_intrinsics=50,
        )
    full = ~np.isnan(rig.all_calib_uvs).any((-1, -2))
    use = np.nonzero(full.sum(0) > 1)[0]
    obs_np = rig.all_calib_uvs[:, use]
    dtype = jnp.float64
    obs = jnp.asarray(np.nan_to_num(obs_np), dtype=dtype)
    mask = jnp.asarray(~np.isnan(obs_np).any(-1))
    cam0 = jnp.asarray(_params_to_arrays(ext, intr), dtype=dtype)
    poses0 = jnp.asarray(np.nan_to_num(np.asarray(poses)[use]), dtype=dtype)
    objp = jnp.asarray(rig.calib_objpoints, dtype=dtype)
    # The shipped TPU mixed recipe (see lm_core.LMOptions / CLAUDE.md);
    # on CPU the f32 extras cost more than they save and stay off.
    f32_extras = (
        {}
        if jax.default_backend() == "cpu"
        else dict(
            block_dtype="float32",
            cost_dtype="float32",
            solve_dtype="float32",
            grad_dtype="float32",
            gtol_rel=1e-6,
            lambda_escalation=3.0,
        )
    )
    opts = LMOptions(
        max_iters=args.max_iters, jac_dtype="float32", **f32_extras
    )

    out = lm_solve(cam0, poses0, obs, mask, objp, opts)  # compile
    _ = np.asarray(out[0])  # host materialization (block_until_ready does
    # not actually wait on remote-execution backends)
    t0 = time.time()
    cam, p, info = lm_solve(cam0 + 1e-6, poses0, obs, mask, objp, opts)
    n_iters = int(info["n_iters"])
    _ = np.asarray(cam)
    wall = time.time() - t0
    print(json.dumps({
        "n_cameras": args.n_cameras,
        "n_frames": int(len(use)),
        "wall_s": round(wall, 4),
        "n_iters": n_iters,
        "iters_per_s": round(n_iters / wall, 2),
        "final_cost": float(info["final_cost"]),
        "platform": jax.default_backend(),
    }))
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="multicam_calibration_tpu",
        description="TPU-native multi-camera calibration",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("detect", help="run chessboard detection on videos")
    p.add_argument("videos", nargs="+")
    p.add_argument("--overwrite", action="store_true")
    _add_board_args(p)
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("calibrate", help="full pipeline: detect -> init -> BA -> save")
    p.add_argument("videos", nargs="+")
    p.add_argument("--output", default="calibration.json")
    p.add_argument("--format", default="json", choices=["json", "jarvis", "gimbal"])
    p.add_argument("--no-adjust", action="store_true", help="skip bundle adjustment")
    p.add_argument("--overwrite", action="store_true")
    _add_board_args(p)
    p.set_defaults(fn=cmd_calibrate)

    p = sub.add_parser("adjust", help="re-run BA from saved calibration")
    p.add_argument("videos", nargs="+")
    p.add_argument("--calibration", required=True)
    p.add_argument("--output", default="calibration_adjusted.json")
    p.add_argument("--format", default="json", choices=["json", "jarvis", "gimbal"])
    p.add_argument(
        "--checkpoint", default=None,
        help="npz path for resumable optimizer state (saved every few iters)",
    )
    p.add_argument(
        "--uncertainty", action="store_true",
        help="print per-parameter standard errors at the optimum",
    )
    _add_board_args(p)
    p.set_defaults(fn=cmd_adjust)

    p = sub.add_parser("export", help="convert calibration between formats")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--from-format", required=True, choices=["json", "jarvis", "gimbal"])
    p.add_argument("--to-format", required=True, choices=["json", "jarvis", "gimbal"])
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("flatibrate", help="fit arena-floor alignment transform")
    p.add_argument("keypoints", help="HDF5 file with 3D keypoints")
    p.add_argument("--dataset", default="keypoints")
    p.add_argument("--output", default="flatibration.npy")
    p.add_argument("--z-down", action="store_true")
    p.add_argument("--residual-threshold", type=float, default=10.0)
    p.add_argument("--center", action="store_true")
    p.add_argument("--flip-z", action="store_true")
    p.set_defaults(fn=cmd_flatibrate)

    p = sub.add_parser("benchmark", help="synthetic BA benchmark")
    p.add_argument("--n-cameras", type=int, default=6)
    p.add_argument("--n-frames", type=int, default=1000)
    p.add_argument("--max-iters", type=int, default=100)
    p.add_argument("--seed", type=int, default=11)
    p.set_defaults(fn=cmd_benchmark)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
