"""Calibration-target detection: board models, TPU corner detector, video IO."""
from .board import generate_chessboard_objpoints

__all__ = ["generate_chessboard_objpoints"]
