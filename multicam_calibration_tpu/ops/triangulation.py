"""Robust multi-view triangulation, batched over camera pairs and points.

TPU-native replacement for the reference ``triangulate``
(/root/reference/multicam_calibration/geometry.py:361-433) and its
cv2.triangulatePoints delegate: per-pair DLT is a batched 4x4 symmetric
eigensolve over (n_pairs, n_points), followed by a masked median across the
C(n,2) pairs — exactly the reference's robust-median semantics but with no
Python loops and static shapes (observation masks instead of NaN gathers).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .projection import (
    denormalize_points,
    distort_normalized,
    distortion_valid_r2,
    normalize_points,
    undistort_normalized,
    undistort_points,
)
from .reductions import masked_median
from .transforms import get_projection_matrix

__all__ = ["triangulate_dlt", "triangulate_pairs", "triangulate"]


def triangulate_dlt(uvs, Ps):
    """DLT triangulation of one point from V >= 2 views.

    ``uvs``: (..., V, 2) pixel coords; ``Ps``: (..., V, 3, 4) projection
    matrices. Builds the standard 2V x 4 design (u*P3 - P1, v*P3 - P2) and
    returns the Euclidean point minimizing ||A X|| — the same linear system
    cv2.triangulatePoints solves by SVD (geometry.py:416-421), batched.
    """
    u = uvs[..., 0:1]
    v = uvs[..., 1:2]
    rows_u = u * Ps[..., 2, :] - Ps[..., 0, :]
    rows_v = v * Ps[..., 2, :] - Ps[..., 1, :]
    A = jnp.concatenate([rows_u, rows_v], axis=-2)
    ATA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(ATA)
    X = vecs[..., :, 0]
    return X[..., :3] / X[..., 3:]


def triangulate_pairs(uvs, Ps, mask=None):
    """Triangulate every point from every camera pair.

    ``uvs``: (n_cameras, n_points, 2) undistorted pixel coords;
    ``Ps``: (n_cameras, 3, 4); ``mask``: (n_cameras, n_points) validity
    (default: finite uvs). Returns ``(points (n_pairs, n_points, 3),
    pair_valid (n_pairs, n_points))`` with the static pair order
    (0,1),(0,2),...,(1,2),... matching the reference loop (geometry.py:413).
    """
    n_cameras = uvs.shape[0]
    if mask is None:
        mask = jnp.all(jnp.isfinite(uvs), axis=-1)
    ii, jj = np.triu_indices(n_cameras, k=1)
    uvs_f = jnp.nan_to_num(uvs)
    pair_uvs = jnp.stack([uvs_f[ii], uvs_f[jj]], axis=-2)  # (P, N, 2, 2)
    pair_Ps = jnp.stack([Ps[ii], Ps[jj]], axis=-3)[:, None]  # (P, 1, 2, 3, 4)
    pts = triangulate_dlt(pair_uvs, pair_Ps)
    pair_valid = mask[ii] & mask[jj]
    return pts, pair_valid


def triangulate(all_uvs, all_extrinsics, all_intrinsics):
    """Robust triangulation: median over all camera-pair DLT estimates.

    API parity with the reference ``triangulate`` (geometry.py:361-433):
    ``all_uvs`` is a list/array of (n_points, 2) per camera with NaN for
    missing observations, ``all_extrinsics`` a list/array of 6-vectors,
    ``all_intrinsics`` a list of (camera_matrix, dist_coefs). Returns
    (n_points, 3) with NaN where fewer than two cameras observed the point.
    """
    uvs = jnp.stack([jnp.asarray(u) for u in all_uvs])
    mask = jnp.all(jnp.isfinite(uvs), axis=-1)
    und = []
    # Invalid-branch guard (beyond-reference robustness): the radial model
    # is only invertible inside its monotonic radius; a corrupted
    # observation beyond it undistorts to an exact-round-trip point on the
    # WRONG branch (cv2.undistortPoints extrapolates the same way,
    # reference geometry.py:354-356) and, entering many camera pairs, can
    # poison the pairwise median. Drop views whose undistorted normalized
    # radius exceeds the camera's valid radius, and views whose round trip
    # fails to reconverge (> 1 px) — a real detection does neither.
    for i in range(uvs.shape[0]):
        K, dist = _split_intrinsics(all_intrinsics[i])
        # The monotonic bound needs concrete coefficients — take them from
        # the caller's (host) intrinsics, not the device array.
        r2_max = distortion_valid_r2(np.asarray(all_intrinsics[i][1]))
        xy_n = normalize_points(uvs[i], K)
        und_n = undistort_normalized(xy_n, dist)
        r2 = jnp.sum(und_n * und_n, axis=-1)
        rt = jnp.linalg.norm(
            jnp.nan_to_num(
                denormalize_points(distort_normalized(und_n, dist), K) - uvs[i]
            ),
            axis=-1,
        )
        ok = (r2 < r2_max) & (rt < 1.0)
        mask = mask.at[i].set(mask[i] & jnp.where(mask[i], ok, False))
        und.append(denormalize_points(und_n, K))
    und = jnp.stack(und)
    Ps = jnp.stack(
        [
            get_projection_matrix(jnp.asarray(all_extrinsics[i]), all_intrinsics[i])
            for i in range(uvs.shape[0])
        ]
    )
    pts, pair_valid = triangulate_pairs(jnp.nan_to_num(und), Ps, mask)
    med = jnp.stack(
        [masked_median(pts[..., k], pair_valid, axis=0) for k in range(3)], axis=-1
    )
    return med


def _split_intrinsics(intrinsics):
    camera_matrix, dist_coefs = intrinsics
    return jnp.asarray(camera_matrix), jnp.asarray(dist_coefs)
