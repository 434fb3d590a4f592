"""Detection throughput benchmark: frames/s through the batched device
pipeline (fused Pallas corner response + NMS/top-K + subpixel on device,
lattice ordering + anchor decisions on host).

The reference's detection runs one cv2.findChessboardCorners call per frame
in a multiprocessing pool (detection.py:80-112); its measured rate is a few
frames/s/core at 480x640. Writes BENCH_DETECTION.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
ROUNDS = 4
BOARD = (5, 7)


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

    # Warm-up compiles all three device stages.
    found = mct.detect_chessboard_batch(frames, board_shape=BOARD)
    t0 = time.time()
    n_det = 0
    for _ in range(ROUNDS):
        found = mct.detect_chessboard_batch(frames, board_shape=BOARD)
        n_det += len(found)
    wall = time.time() - t0
    fps = BATCH * ROUNDS / wall
    rec = {
        "frames_per_s": round(fps, 2),
        "batch": BATCH,
        "rounds": ROUNDS,
        "detection_rate": round(n_det / (BATCH * ROUNDS), 3),
        "image": "480x640 synthetic board views",
        "platform": jax.default_backend(),
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
