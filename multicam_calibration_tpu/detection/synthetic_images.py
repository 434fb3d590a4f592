"""Synthetic chessboard image rendering — the detection test oracle.

Renders the reference's physical target (two-sided checkerboard with a dark
anchor circle near the top-left corner, docs/source/setup.rst) under
arbitrary homographies, with ground-truth corner positions. Used to test
the TPU detector's detection rate and subpixel accuracy without video
fixtures (the reference snapshot ships none — SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

__all__ = ["render_board_image", "render_board_view", "random_view_homography"]


def random_view_homography(
    rng, out_size=(480, 640), board_shape=(5, 7), square_px=40,
    margin_squares=2, scale_range=(0.45, 0.8), perspective=2e-4,
):
    """Random homography that keeps the (canonical) board centered in view.

    Rotation is uniform in [0, 2pi); scale anisotropy and mild projective
    terms model tilt. The canonical-board center maps to the view center.
    """
    rows, cols = board_shape
    can_h = (rows + 1 + 2 * margin_squares) * square_px
    can_w = (cols + 1 + 2 * margin_squares) * square_px
    center = np.array([can_w / 2, can_h / 2])
    ang = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(ang), np.sin(ang)
    A = np.array([[c, -s], [s, c]]) @ np.diag(rng.uniform(*scale_range, 2))
    p = rng.uniform(-1, 1, 2) * perspective
    H = np.eye(3)
    H[:2, :2] = A
    H[2, :2] = p
    # Solve the translation so H maps the board center to the view center.
    out_c = np.array([out_size[1] / 2, out_size[0] / 2])
    w = 1.0 + p @ center
    H[:2, 2] = out_c * w - A @ center
    return H


def render_board_image(
    board_shape=(5, 7), square_px=40, margin_squares=2, anchor=True
):
    """Canonical fronto-parallel board image + ground-truth corner coords.

    Returns (image (H, W) float in [0, 255], corners (rows*cols, 2) in
    (x, y) pixel coords, row-major over the (rows, cols) lattice with the
    anchor adjacent to corner 0).
    """
    rows, cols = board_shape
    n_sq_y = rows + 1
    n_sq_x = cols + 1
    m = margin_squares
    H = (n_sq_y + 2 * m) * square_px
    W = (n_sq_x + 2 * m) * square_px
    img = np.full((H, W), 255.0)
    for i in range(n_sq_y):
        for j in range(n_sq_x):
            if (i + j) % 2 == 0:
                y0 = (m + i) * square_px
                x0 = (m + j) * square_px
                img[y0 : y0 + square_px, x0 : x0 + square_px] = 0.0
    # Interior corners: (rows x cols) lattice, ordered rows-fastest to match
    # generate_chessboard_objpoints / the detector's uvs convention
    # (consecutive points step along the rows axis; uvs.reshape(cols, rows)
    # recovers the lattice).
    ys = (m + 1 + np.arange(rows)) * square_px
    xs = (m + 1 + np.arange(cols)) * square_px
    corners = np.stack(
        [np.repeat(xs, rows), np.tile(ys, cols)], axis=-1
    ).astype(float)
    if anchor:
        # Dark circle at the position the reference's anchor matcher probes:
        # extended-grid cell (0.5, 0.5) with the grid starting at (3, 1),
        # i.e. 2.5 lattice steps beyond corner 0 along the cols axis (x) and
        # 0.5 steps before it along the rows axis (y); radius = half a cell
        # (the 40x40 template's size//4 circle, detection.py:408-412).
        cy = ys[0] - 0.5 * square_px
        cx = xs[0] - 2.5 * square_px
        yy, xx = np.mgrid[0:H, 0:W]
        circle = (yy - cy) ** 2 + (xx - cx) ** 2 <= (0.5 * square_px) ** 2
        img[circle] = 0.0
    return img, corners


def render_board_view(
    H_board_to_view,
    out_size=(480, 640),
    board_shape=(5, 7),
    square_px=40,
    noise=2.0,
    blur_sigma=1.0,
    seed=0,
):
    """Warp the canonical board through a homography into a camera view.

    Returns (view image (h, w) float, gt_corners (rows*cols, 2) in view
    pixel coords). Homography maps canonical-image pixels -> view pixels.
    """
    import cv2

    canonical, corners = render_board_image(board_shape, square_px)
    h, w = out_size
    view = cv2.warpPerspective(
        canonical, np.asarray(H_board_to_view), (w, h),
        flags=cv2.INTER_LINEAR, borderValue=180.0,
    )
    if blur_sigma > 0:
        view = cv2.GaussianBlur(view, (0, 0), blur_sigma)
    rng = np.random.default_rng(seed)
    if noise > 0:
        view = view + rng.standard_normal(view.shape) * noise
    view = np.clip(view, 0, 255)
    pts = np.concatenate([corners, np.ones((len(corners), 1))], axis=1)
    proj = pts @ np.asarray(H_board_to_view).T
    gt = proj[:, :2] / proj[:, 2:]
    return view, gt
