"""Utilities: calibration I/O, detection caches, config, metrics."""
from .io import load_calibration, save_calibration
from .metrics import Metrics, metrics

__all__ = ["load_calibration", "save_calibration", "Metrics", "metrics"]
