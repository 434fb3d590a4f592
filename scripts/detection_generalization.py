"""Detection generalization sweep: rates on FRESH random seeds.

The unit/bench suites fix their seeds (tests/test_detection.py uses rng
seeds 100+k, scripts/bench_detection.py likewise); a detector tuned to
those exact frames could look better than it is. This sweep re-runs the
hard-frame, blur-ladder and occlusion suites on disjoint seed ranges and
compares detection rates against the reference's cv2 detector on the
identical frames (reference detect_chessboard,
/root/reference/multicam_calibration/detection.py:300).

Usage: python scripts/detection_generalization.py [n_per_suite] [seed0]
Writes DETECTION_GENERALIZATION.json at the repo root.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOARD = (5, 7)
K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
DIST = np.array([-0.28, 0.12])


def _reference_detection():
    import importlib
    import types

    if "refmcc.detection" in sys.modules:
        return sys.modules["refmcc.detection"]
    for name in ("vidio", "vidio.read", "pandas", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "vidio.read":
                mod.OpenCVReader = object
            sys.modules[name] = mod
    pkg = types.ModuleType("refmcc")
    pkg.__path__ = ["/root/reference/multicam_calibration"]
    sys.modules["refmcc"] = pkg
    return importlib.import_module("refmcc.detection")


def _views(n, seed0, **kw):
    from multicam_calibration_tpu.detection.synthetic_images import (
        random_view_homography,
        render_board_view,
    )

    out = []
    for k in range(n):
        rng = np.random.default_rng(seed0 + k)
        H = random_view_homography(rng, board_shape=BOARD)
        out.append(
            render_board_view(
                H, out_size=(480, 640), board_shape=BOARD, noise=2.0,
                seed=seed0 + k, **kw,
            )
        )
    return out


def _codec_round_trip(frames, bits_per_px=0.12, fps=30.0):
    """Encode frames at a realistic lossy bitrate (mpeg4, ~``bits_per_px``
    bits/pixel/frame — consumer-camera territory) through the native C++
    encoder, decode them back, and return the decoded frames. This is what
    the detectors actually see in production: every real calibration video
    passed through a codec (VERDICT r2 missing #1)."""
    import tempfile

    from multicam_calibration_tpu.detection.native_video import (
        NativeVideoReader,
        NativeVideoWriter,
        available,
    )

    if not available():
        return None
    h, w = frames[0].shape[:2]
    bit_rate = int(w * h * fps * bits_per_px)
    path = tempfile.mktemp(suffix=".mp4", prefix="mcc_codec_rt_")
    try:
        wr = NativeVideoWriter(path, w, h, fps=fps, gray=True,
                               bit_rate=bit_rate)
        for f in frames:
            wr.write(f)
        wr.close()
        rd = NativeVideoReader(path, gray=True)
        out = rd.read_batch(len(frames))
        rd.close()
    finally:
        if os.path.exists(path):
            os.unlink(path)
    if out.shape[0] != len(frames):
        raise RuntimeError(
            f"codec round trip lost frames: {out.shape[0]} != {len(frames)}"
        )
    return [np.asarray(f) for f in out]


def _run_suite(name, views, ref_det, err_cap=5.0, codec=False):
    import multicam_calibration_tpu as mct

    frames = [v.astype(np.uint8) for v, _ in views]
    if codec:
        decoded = _codec_round_trip(frames)
        if decoded is None:
            print(json.dumps({"suite": name, "skipped": "no native codec"}))
            return {"suite": name, "skipped": "no native codec"}
        frames = decoded
    t0 = time.time()
    dets = mct.detect_chessboard_batch(frames, board_shape=BOARD)
    wall = time.time() - t0
    n_us, errs, bad = 0, [], 0
    for i, (_, gt) in enumerate(views):
        if i in dets:
            n_us += 1
            d = np.linalg.norm(dets[i][0][:, None] - gt[None], axis=-1)
            err = float(d.min(0).mean())
            errs.append(err)
            bad += err >= err_cap
    n_ref = 0
    for f in frames:
        rgb = np.stack([f] * 3, -1)
        n_ref += ref_det.detect_chessboard(rgb, board_shape=BOARD) is not None
    row = {
        "suite": name,
        "n": len(views),
        "ours": n_us,
        "reference_cv2": n_ref,
        "corrupted_accepted": int(bad),
        "median_err_px": round(float(np.median(errs)), 3) if errs else None,
        "max_err_px": round(float(np.max(errs)), 3) if errs else None,
        "wall_s": round(wall, 2),
    }
    print(json.dumps(row))
    return row


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    import jax

    # Backend init on the remote axon TPU can hang indefinitely when the
    # service is down (observed 2026-08-17), and jax.default_backend()
    # triggers it — force CPU unless the caller explicitly asks for the
    # device run. Rates are platform-independent; throughput is measured
    # by scripts/bench_detection.py instead.
    if not os.environ.get("MCC_GEN_TPU"):
        jax.config.update("jax_platforms", "cpu")
    ref_det = _reference_detection()

    hard_kw = dict(
        camera_matrix=K, dist_coefs=DIST, lighting_gradient=0.8,
        vignette=0.4, clutter=6,
    )
    rows = [
        _run_suite("clean", _views(n, seed0), ref_det),
        _run_suite(
            "distorted", _views(n, seed0 + 1000, camera_matrix=K,
                                dist_coefs=DIST), ref_det,
        ),
        _run_suite("hard", _views(n, seed0 + 2000, **hard_kw), ref_det),
    ]
    for blur in (12, 16, 24):
        rows.append(
            _run_suite(
                f"blur_{blur}px",
                _views(n, seed0 + 3000 + blur, motion_blur_px=blur),
                ref_det,
            )
        )
    # Occlusion LADDER (VERDICT r2 weak #4: a single 25 px setting where
    # both detectors score 0 validates nothing): bar widths from "thin
    # cable" to "forearm", plus a two-bar variant.
    for occ in (8, 12, 16, 25):
        rows.append(
            _run_suite(
                f"occluded_{occ}px",
                _views(n, seed0 + 4000 + occ, occlusion_px=occ),
                ref_det,
            )
        )
    rows.append(
        _run_suite(
            "occluded_10px_x2",
            _views(n, seed0 + 4500, occlusion_px=10, occlusion_bars=2),
            ref_det,
        )
    )
    # Scene realism: textured background, specular glare on the board
    # edge, and the codec round trip (mpeg4 at a realistic lossy bitrate
    # through the native encode/decode runtime) on clean and hard frames.
    rows.append(
        _run_suite(
            "textured_bg",
            _views(n, seed0 + 5000, background_texture=0.7, clutter=4),
            ref_det,
        )
    )
    rows.append(
        _run_suite(
            "specular",
            _views(n, seed0 + 6000, camera_matrix=K, dist_coefs=DIST,
                   specular=3),
            ref_det,
        )
    )
    rows.append(
        _run_suite(
            "codec_clean", _views(n, seed0 + 7000), ref_det, codec=True,
        )
    )
    rows.append(
        _run_suite(
            "codec_hard", _views(n, seed0 + 8000, **hard_kw), ref_det,
            codec=True,
        )
    )
    out = {
        "seed0": seed0,
        "n_per_suite": n,
        "board": BOARD,
        "suites": rows,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DETECTION_GENERALIZATION.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
