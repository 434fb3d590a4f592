"""Detection throughput benchmark: frames/s through the batched device
pipeline (fused Pallas corner response + NMS/top-K + subpixel on device,
lattice ordering + anchor decisions on host), MEASURED against the
reference's cv2 detector (detection.py:300 findChessboardCorners +
cornerSubPix + anchor reorder) on the identical frames.

The reference parallelizes with a per-video worker pool (detection.py:80-112)
that scales linearly in cores; we measure its single-core rate and report the
pool-extrapolated rate at this machine's core count as the honest baseline.
Writes BENCH_DETECTION.json.
"""
import importlib
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
ROUNDS = 4
BOARD = (5, 7)


def measure_reference(frames):
    """Single-core fps of the reference detector on ``frames``."""
    # The reference detection module imports vidio/pandas/tqdm at top level
    # for its video IO; stub the ones this image lacks — detect_chessboard
    # itself only needs cv2 + numpy.
    for name in ("vidio", "vidio.read", "pandas", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "vidio.read":
                mod.OpenCVReader = object
            sys.modules[name] = mod
    _pkg = types.ModuleType("refmcc")
    _pkg.__path__ = ["/root/reference/multicam_calibration"]
    sys.modules.setdefault("refmcc", _pkg)
    ref_det = importlib.import_module("refmcc.detection")

    out = ref_det.detect_chessboard(frames[0], board_shape=BOARD)  # warm
    t0 = time.time()
    n_det = 0
    for frame in frames:
        out = ref_det.detect_chessboard(frame, board_shape=BOARD)
        n_det += out is not None
    wall = time.time() - t0
    return len(frames) / wall, n_det / len(frames)


def main():
    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.detection.synthetic_images import (
        random_view_homography,
        render_board_view,
    )
    import jax

    frames = []
    for k in range(BATCH):
        rng = np.random.default_rng(k)
        H = random_view_homography(rng, board_shape=BOARD)
        view, _ = render_board_view(
            H, out_size=(480, 640), board_shape=BOARD, noise=1.5, seed=k
        )
        frames.append(np.asarray(view).astype(np.uint8))

    from multicam_calibration_tpu.detection.detector import (
        detect_chessboard_batches,
    )

    def measure(batch, rounds):
        """Pipelined throughput (the production process_video shape):
        device stage k+1 dispatched before host ordering of batch k."""
        batches = [frames * (batch // BATCH)] * rounds
        # warm-up compiles the device stages for this batch shape
        next(detect_chessboard_batches(iter(batches[:1]), board_shape=BOARD))
        t0 = time.time()
        n_det = 0
        for found in detect_chessboard_batches(
            iter(batches), board_shape=BOARD
        ):
            n_det += len(found)
        wall = time.time() - t0
        return batch * rounds / wall, n_det / (batch * rounds)

    results = {}
    for batch in (32, 128):
        fps_b, rate_b = measure(batch, ROUNDS)
        results[batch] = (fps_b, rate_b)
        print(f"batch {batch}: {fps_b:.1f} fps, rate {rate_b:.3f}", flush=True)
    best_batch = max(results, key=lambda b: results[b][0])
    fps, rate = results[best_batch]

    ref_fps_core, ref_rate = measure_reference(frames)
    n_cores = os.cpu_count() or 1
    ref_fps_pool = ref_fps_core * n_cores
    rec = {
        "frames_per_s": round(fps, 2),
        "batch": best_batch,
        "rounds": ROUNDS,
        "detection_rate": round(rate, 3),
        "per_batch_fps": {str(b): round(results[b][0], 2) for b in results},
        "image": "480x640 synthetic board views",
        "platform": jax.default_backend(),
        "reference_fps_per_core": round(ref_fps_core, 2),
        "reference_fps_pool_extrapolated": round(ref_fps_pool, 2),
        "reference_detection_rate": round(ref_rate, 3),
        "n_cores": n_cores,
        "vs_reference_pool": round(fps / ref_fps_pool, 2),
    }
    print(json.dumps(rec))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETECTION.json",
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
