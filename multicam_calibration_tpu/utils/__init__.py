"""Utilities: calibration I/O, detection caches, config, metrics."""
from .io import load_calibration, save_calibration

__all__ = ["load_calibration", "save_calibration"]
