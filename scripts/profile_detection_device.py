"""Device-resident sub-stage timing of the detection fast path at batch 128.

Splits _stage1_fast into its three programs (candidates, device lattice
ordering, refine+anchor) and times each separately with outputs
materialized to host, plus a half-resolution candidates variant (the coarse
decimation plan) and the refine/anchor split. Guides the clean-frame
speed-of-light work (VERDICT r2 weak #2: device_resident 311 fps vs cv2
505 fps/core).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BOARD = (5, 7)


def main():
    import jax
    import jax.numpy as jnp

    from multicam_calibration_tpu.detection.detector import (
        _batched_anchor_scores,
        _find_candidates,
        _gray_from_u8,
        _order_grids_jit,
        _refine_and_score,
        _refine_points,
        _stage1_fast,
    )
    from multicam_calibration_tpu.detection.synthetic_images import (
        random_view_homography,
        render_board_view,
    )

    frames = []
    for k in range(32):
        rng = np.random.default_rng(k)
        H = random_view_homography(rng, board_shape=BOARD)
        view, _ = render_board_view(
            H, out_size=(480, 640), board_shape=BOARD, noise=1.5, seed=k
        )
        frames.append(np.asarray(view).astype(np.uint8))
    stack = np.stack(frames * (BATCH // 32))
    gray = _gray_from_u8(jnp.asarray(stack))
    np.asarray(gray[0, 0, 0])

    def timed(label, fn, reps=5):
        fn()  # warm/compile
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        w = float(np.median(walls))
        print(
            f"{label:44s} {w*1e3:8.1f} ms  ({BATCH/w:7.1f} fps)", flush=True
        )
        return w

    t_cand = timed(
        "candidates (resp+NMS+topK) full res",
        lambda: np.asarray(_find_candidates(gray, 160, 4)[0]),
    )

    half = jax.jit(
        lambda g: 0.25
        * (g[:, ::2, ::2] + g[:, 1::2, ::2] + g[:, ::2, 1::2] + g[:, 1::2, 1::2])
    )
    gray_h = half(gray)
    np.asarray(gray_h[0, 0, 0])
    t_cand_h = timed(
        "candidates half res (device-decimated)",
        lambda: np.asarray(_find_candidates(gray_h, 160, 4)[0]),
    )

    xy, score = _find_candidates(gray, 160, 4)
    np.asarray(xy[0, 0])
    t_ord = timed(
        "device lattice ordering",
        lambda: np.asarray(_order_grids_jit(xy, score, BOARD[0], BOARD[1])[0]),
    )
    grids, ok = _order_grids_jit(xy, score, BOARD[0], BOARD[1])
    grids = grids.astype(gray.dtype)
    np.asarray(ok)

    flat = grids.reshape(BATCH, -1, 2)
    t_ref = timed(
        "subpix refine (35 corners, win 5, default iters)",
        lambda: np.asarray(_refine_points(gray, flat, 5)),
    )
    t_anc = timed(
        "anchor scores (4 warps x 40x40)",
        lambda: np.asarray(_batched_anchor_scores(gray, grids)),
    )
    t_rs = timed(
        "fused refine+score",
        lambda: np.asarray(_refine_and_score(gray, grids, 40, 5)[0]),
    )

    def full_fast():
        out = _stage1_fast(gray, 160, 4, BOARD[0], BOARD[1], 40, 5)
        return tuple(np.asarray(a) for a in out)

    t_all = timed("FULL fast stage1 (backend dispatch)", full_fast)

    from multicam_calibration_tpu.detection.detector import _stage1_fused

    def full_fused():
        out = _stage1_fused(gray, 160, 4, BOARD[0], BOARD[1], 40, 5)
        return tuple(np.asarray(a) for a in out)

    t_fused = timed("FULL fused stage1 (ONE program)", full_fused)
    print(
        f"sum of parts {1e3*(t_cand + t_ord + t_rs):.1f} ms vs dispatch "
        f"{1e3*t_all:.1f} ms vs fused {1e3*t_fused:.1f} ms"
    )


if __name__ == "__main__":
    main()
