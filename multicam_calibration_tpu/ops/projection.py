"""Camera projection + lens distortion ops (batched, differentiable, jit-safe).

Replaces the reference's projection kernel and its OpenCV delegate for
inverse distortion (/root/reference/multicam_calibration/geometry.py:277-358):

- ``project_points`` reproduces the reference's forward model exactly
  (pinhole + radial k1,k2 distortion applied on normalized coordinates,
  geometry.py:277-325) — it is THE residual kernel of bundle adjustment.
- ``distort_points`` / ``undistort_points`` implement the full 5-coefficient
  OpenCV model (k1,k2,p1,p2,k3) with a fixed-iteration inverse (the cv2
  replacement: cv2.undistortPoints is an iterative C++ routine; here it's a
  fixed-point loop that is jit/vmap-safe and NaN-transparent, so no masking
  wrapper is needed).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .transforms import apply_rigid_transform, get_transformation_matrix

__all__ = [
    "project_points",
    "distort_normalized",
    "distort_points",
    "undistort_normalized",
    "undistort_points",
    "normalize_points",
    "denormalize_points",
    "distortion_valid_r2",
]

# Fixed-point iterations for inverse distortion. cv2.undistortPoints uses 5 by
# default; we use a few more since each is a handful of FLOPs and this keeps
# round-trip error at float-eps even for strong distortion.
_UNDISTORT_ITERS = 12


def _pad_dist_coefs(dist_coefs, dtype):
    """Return (k1,k2,p1,p2,k3), zero-padding short coefficient vectors."""
    if dist_coefs is None:
        z = jnp.zeros((), dtype=dtype)
        return z, z, z, z, z
    d = jnp.asarray(dist_coefs, dtype=dtype).reshape(-1)
    n = d.shape[0]
    if n < 5:
        d = jnp.concatenate([d, jnp.zeros(5 - n, dtype=dtype)])
    return d[0], d[1], d[2], d[3], d[4]


def distortion_valid_r2(dist_coefs):
    """Squared normalized radius where the radial model stops being invertible.

    The distorted radius ``rd(r) = r * (1 + k1 r^2 + k2 r^4 + k3 r^6)`` is
    only invertible while it is increasing; past its first stationary point
    (``d rd/d r = 1 + 3 k1 r^2 + 5 k2 r^4 + 7 k3 r^6 = 0``) every distorted
    radius has a SECOND preimage on the far branch, and the fixed-point
    inverse can silently converge there (the round trip is exact, the point
    is wrong). Returns the smallest positive root of the derivative cubic
    in r^2, or +inf when the model is globally monotonic (e.g. pincushion
    k1 > 0 with small higher terms). Host-side numpy on the concrete
    coefficients — use it to build validity masks for observations.
    """
    k = np.zeros(5)
    if dist_coefs is not None:
        d = np.asarray(dist_coefs, float).reshape(-1)[:5]
        k[: d.shape[0]] = d
    k1, k2, _, _, k3 = k
    # 7 k3 u^3 + 5 k2 u^2 + 3 k1 u + 1 = 0 with u = r^2
    coefs = [7.0 * k3, 5.0 * k2, 3.0 * k1, 1.0]
    coefs = np.trim_zeros(coefs, "f")
    if len(coefs) < 2:
        return np.inf
    roots = np.roots(coefs)
    pos = roots[(np.abs(roots.imag) < 1e-12) & (roots.real > 0)].real
    return float(pos.min()) if pos.size else np.inf


def distort_normalized(xy, dist_coefs):
    """Apply the 5-coefficient distortion model to normalized coords (...,2)."""
    k1, k2, p1, p2, k3 = _pad_dist_coefs(dist_coefs, xy.dtype)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_distorted, dist_coefs, n_iters=_UNDISTORT_ITERS):
    """Invert ``distort_normalized`` by fixed-point iteration (cv2-style)."""
    k1, k2, p1, p2, k3 = _pad_dist_coefs(dist_coefs, xy_distorted.dtype)
    xd, yd = xy_distorted[..., 0], xy_distorted[..., 1]
    x, y = xd, yd
    for _ in range(n_iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y], axis=-1)


def normalize_points(uvs, camera_matrix):
    """Pixel coords (...,2) -> normalized camera coords via K^-1 (analytic)."""
    K = jnp.asarray(camera_matrix, dtype=uvs.dtype)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    skew = K[..., 0, 1]
    y = (uvs[..., 1] - cy) / fy
    x = (uvs[..., 0] - cx - skew * y) / fx
    return jnp.stack([x, y], axis=-1)


def denormalize_points(xy, camera_matrix):
    """Normalized camera coords (...,2) -> pixel coords via K."""
    K = jnp.asarray(camera_matrix, dtype=xy.dtype)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    skew = K[..., 0, 1]
    u = fx * xy[..., 0] + skew * xy[..., 1] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def project_points(points, extrinsics, camera_matrix, dist_coefs=None):
    """Project world points (...,3) to pixel coords (...,2).

    Exact forward-model parity with the reference ``project_points``
    (geometry.py:277-325): rigid transform into the camera frame, radial
    distortion ``1 + k1 r^2 + k2 r^4`` evaluated on normalized coordinates
    scaling x and y (z untouched), then K-projection with perspective divide.
    When ``dist_coefs`` has tangential/k3 terms they are applied too (the
    reference's own BA model keeps them at zero, bundle_adjustment.py:187).
    """
    extrinsics = jnp.asarray(extrinsics)
    T = get_transformation_matrix(extrinsics) if extrinsics.shape[-1] == 6 else extrinsics
    points_cam = apply_rigid_transform(T, points)
    xy_norm = points_cam[..., :2] / points_cam[..., 2:]
    xy_dist = distort_normalized(xy_norm, dist_coefs) if dist_coefs is not None else xy_norm
    return denormalize_points(xy_dist, camera_matrix)


def distort_points(uvs, camera_matrix, dist_coefs):
    """Apply lens distortion to ideal pixel coords (inverse of undistort)."""
    return denormalize_points(
        distort_normalized(normalize_points(uvs, camera_matrix), dist_coefs),
        camera_matrix,
    )


def undistort_points(uvs, camera_matrix, dist_coefs):
    """Remove lens distortion from observed pixel coords (...,2).

    Parity with the reference ``undistort_points`` wrapper (geometry.py:328-358)
    which calls cv2.undistortPoints with P=camera_matrix: output is in pixel
    coordinates of the same camera. NaN inputs propagate to NaN outputs (no
    masking needed — the iteration is NaN-transparent).
    """
    return denormalize_points(
        undistort_normalized(normalize_points(uvs, camera_matrix), dist_coefs),
        camera_matrix,
    )
