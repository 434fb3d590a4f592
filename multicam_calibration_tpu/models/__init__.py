"""Model layer: calibration pipelines built on the ops foundation.

- ``lm_core``: sparse Schur-complement Levenberg–Marquardt engine (replaces
  scipy.optimize.least_squares TRF, the reference's hot path).
- ``bundle_adjustment``: reference-parity bundle_adjust API on top of lm_core.
- ``initialize``: Zhang intrinsics + planar PnP + spanning-tree extrinsics
  (replaces cv2.calibrateCamera / cv2.solvePnP).
- ``flatibration``: floor-plane alignment.
"""
