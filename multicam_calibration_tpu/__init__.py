"""multicam_calibration_tpu — TPU-native multi-camera calibration framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference package (dattalab-6-cam/multicam-calibration): chessboard detection,
intrinsics/extrinsics initialization, sparse Schur-complement bundle
adjustment, triangulation, flatibration, QC visualization, and JSON/JARVIS/
GIMBAL export — engineered for TPU meshes (frame-axis sharding, XLA
collectives) rather than single-process CPU loops.
"""

from .ops import *  # noqa: F401,F403
from .ops import __all__ as _ops_all

__all__ = list(_ops_all)

__version__ = "0.1.0"
