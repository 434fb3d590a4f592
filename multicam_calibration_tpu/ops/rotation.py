"""SO(3) rotation ops: axis-angle <-> rotation matrix, batched and jit-safe.

TPU-native re-design of the reference's Rodrigues helpers
(/root/reference/multicam_calibration/geometry.py:8-65). Everything here is a
pure function over jnp arrays, differentiable, vmap-able, and safe at the
theta=0 singularity (uses Taylor-stable sinc forms instead of dividing by
theta), so the bundle-adjustment Jacobians are exact even for identity poses.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "skew",
    "rodrigues",
    "rodrigues_inv",
    "so3_exp",
    "so3_log",
]

# Below this angle, use Taylor expansions of sin(t)/t and (1-cos(t))/t^2.
_SMALL_ANGLE = 1e-8


def skew(r):
    """Skew-symmetric (cross-product) matrix of vectors ``r`` of shape (...,3)."""
    zeros = jnp.zeros_like(r[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -r[..., 2], r[..., 1]], axis=-1),
            jnp.stack([r[..., 2], zeros, -r[..., 0]], axis=-1),
            jnp.stack([-r[..., 1], r[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(r):
    """Axis-angle vectors (...,3) -> rotation matrices (...,3,3).

    R = I + sinc(t) * K + ((1-cos t)/t^2) * K^2 with K = skew(r); the two
    coefficients are evaluated with series fallbacks near t=0 so the function
    (and its JVP, used by the analytic BA Jacobians) is smooth everywhere.
    """
    theta2 = jnp.sum(r * r, axis=-1)[..., None, None]
    small = theta2 < _SMALL_ANGLE
    # "Double-where" trick: clamp the argument of sqrt in the small-angle case
    # so the non-selected branch can't produce NaN cotangents under autodiff.
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe_theta2)
    # sin(t)/t and (1 - cos(t))/t^2, series-expanded near zero.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)
    K = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def so3_log(R):
    """Rotation matrices (...,3,3) -> axis-angle vectors (...,3).

    Matches the reference's arccos/trace formulation
    (geometry.py:38-65) but is safe at theta=0; like the reference it is
    ill-conditioned exactly at theta=pi (measure-zero; the calibration
    pipelines never produce it because relative poses are well within pi).
    """
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # v = 2 sin(theta) * axis  =>  r = theta * v / (2 sin(theta)) = v * g(theta)
    # with g(t) = t / (2 sin t) -> 1/2 as t -> 0.
    sin_theta = jnp.sin(theta)
    small = theta < 1e-6
    g = jnp.where(
        small,
        0.5 + theta**2 / 12.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta),
    )
    return v * g[..., None]


# Reference-compatible aliases (multicam_calibration.geometry.rodrigues /
# rodrigues_inv, geometry.py:8,38).
rodrigues = so3_exp
rodrigues_inv = so3_log
