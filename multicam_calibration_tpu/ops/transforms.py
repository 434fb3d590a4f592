"""SE(3) rigid-transform ops, batched and jit-safe.

Capability parity with the reference's transform helpers
(/root/reference/multicam_calibration/geometry.py:68-274) re-designed as pure
JAX functions: 6-vector <-> 4x4 matrix conversion, analytic SE(3) inverse
(no generic 4x4 LAPACK inverse in the hot path), composition, point
application, homogeneous-coordinate helpers, and Kabsch alignment.
"""
from __future__ import annotations

import jax.numpy as jnp

from .rotation import so3_exp, so3_log

__all__ = [
    "get_transformation_matrix",
    "get_transformation_vector",
    "se3_inverse",
    "se3_inverse_vector",
    "se3_compose",
    "apply_rigid_transform",
    "euclidean_to_homogenous",
    "homogeneous_to_euclidean",
    "rigid_transform_from_correspondences",
    "get_projection_matrix",
]


def get_transformation_matrix(t):
    """6-vectors (...,6) [axis-angle | translation] -> 4x4 matrices (...,4,4).

    Parity: reference ``get_transformation_matrix`` (geometry.py:155-176).
    """
    R = so3_exp(t[..., :3])
    top = jnp.concatenate([R, t[..., 3:, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=t.dtype), (*t.shape[:-1], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def get_transformation_vector(T):
    """4x4 matrices (...,4,4) -> 6-vectors (...,6).

    Parity: reference ``get_transformation_vector`` (geometry.py:178-197).
    """
    return jnp.concatenate([so3_log(T[..., :3, :3]), T[..., :3, 3]], axis=-1)


def se3_inverse(T):
    """Analytic inverse of 4x4 rigid transforms: [R|t]^-1 = [R^T | -R^T t]."""
    R_T = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t_inv = -(R_T @ T[..., :3, 3:])
    top = jnp.concatenate([R_T, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), (*T.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse_vector(t):
    """Inverse directly in 6-vector form."""
    return get_transformation_vector(se3_inverse(get_transformation_matrix(t)))


def se3_compose(t1, t2):
    """Compose 6-vector transforms: result applies ``t2`` then ``t1``."""
    return get_transformation_vector(
        get_transformation_matrix(t1) @ get_transformation_matrix(t2)
    )


def euclidean_to_homogenous(x):
    """(..., d) -> (..., d+1) by appending a 1 (geometry.py:232-252 parity)."""
    return jnp.concatenate([x, jnp.ones((*x.shape[:-1], 1), dtype=x.dtype)], axis=-1)


def homogeneous_to_euclidean(x):
    """(..., d+1) -> (..., d) by perspective division (geometry.py:255-274)."""
    return x[..., :-1] / x[..., -1:]


def apply_rigid_transform(transform, points):
    """Apply a 6-vector or (...,4,4) transform to points (...,3).

    Parity: reference ``apply_rigid_transform`` (geometry.py:128-152). Accepts
    either format; batched matrices broadcast against leading point dims.
    """
    transform = jnp.asarray(transform)
    if transform.shape[-1] == 6:
        transform = get_transformation_matrix(transform)
    R = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, points) + t


def rigid_transform_from_correspondences(source_points, target_points, weights=None):
    """Weighted Kabsch alignment: best-fit rigid transform source -> target.

    Parity: reference ``rigid_transform_from_correspondences``
    (geometry.py:68-125), with an optional weight vector (used by the RANSAC
    flatibration refit). Returns ``(t6, rmsd)``.
    """
    source = source_points.reshape(-1, 3)
    target = target_points.reshape(-1, 3)
    if weights is None:
        w = jnp.ones(source.shape[0], dtype=source.dtype)
    else:
        w = weights.reshape(-1).astype(source.dtype)
    wsum = jnp.sum(w)
    mu_s = jnp.einsum("n,ni->i", w, source) / wsum
    mu_t = jnp.einsum("n,ni->i", w, target) / wsum
    s_c = source - mu_s
    t_c = target - mu_t
    H = jnp.einsum("n,ni,nj->ij", w, s_c, t_c)
    U, _, Vt = jnp.linalg.svd(H)
    # Reflection fix via the sign of det, branch-free.
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=source.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    translation = mu_t - R @ mu_s
    t6 = jnp.concatenate([so3_log(R), translation])
    transformed = s_c @ R.T + mu_t
    rmsd = jnp.sqrt(jnp.einsum("n,n->", w, jnp.sum((transformed - target) ** 2, -1)) / wsum)
    return t6, rmsd


def get_projection_matrix(extrinsics, intrinsics):
    """P = K [R|t] of shape (..., 3, 4) from 6-vector extrinsics.

    Parity: reference ``get_projection_matrix`` (geometry.py:200-229);
    ``intrinsics`` is the reference-style tuple ``(camera_matrix, dist_coefs)``
    or just the camera matrix.
    """
    if isinstance(intrinsics, (tuple, list)):
        camera_matrix = intrinsics[0]
    else:
        camera_matrix = intrinsics
    camera_matrix = jnp.asarray(camera_matrix)
    T = get_transformation_matrix(jnp.asarray(extrinsics))
    return camera_matrix @ T[..., :3, :]
