"""Matmul-precision control for TPU numerical correctness.

On TPU, jnp matmul/einsum default to bfloat16 MXU passes. Calibration
geometry multiplies ~10^3-magnitude coordinates (mm translations, pixel
focal lengths); an 8-bit mantissa injects ~mm-scale noise that dominates the
sub-pixel residuals BA minimizes. Every jitted entry point on the compute
path therefore traces under ``jax.default_matmul_precision('highest')``
(fp32-equivalent multi-pass on the MXU — these are small matmuls, so the
extra passes are free relative to HBM traffic).
"""
from __future__ import annotations

import functools

import jax

__all__ = ["with_highest_precision"]


def with_highest_precision(fn):
    """Decorator: trace ``fn`` with fp32-accurate MXU matmuls."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
