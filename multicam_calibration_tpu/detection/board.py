"""Calibration-board models (canonical 3D point layouts)."""
from __future__ import annotations

import numpy as np

__all__ = ["generate_chessboard_objpoints"]


def generate_chessboard_objpoints(chess_board_shape, chess_board_square_size):
    """Canonical 3D chessboard corner coordinates (z=0 plane, row-major).

    Parity with the reference ``generate_chessboard_objpoints``
    (/root/reference/multicam_calibration/detection.py:492-518): the first
    point is at the origin and points advance ``square_size`` apart along the
    grid in the same ordering.
    """
    rows, cols = chess_board_shape
    grid = np.mgrid[0:rows, 0:cols].T.reshape(-1, 2).astype(np.float64)
    objpoints = np.zeros((rows * cols, 3))
    objpoints[:, :2] = grid * chess_board_square_size
    return objpoints
