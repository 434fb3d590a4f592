"""Pallas kernel oracle tests (interpreter mode on the CPU test mesh).

The fused corner-response kernel must match the XLA conv implementation
(detection/detector.py:corner_response) exactly away from the 1-pixel
border (see ops/pallas_kernels.py module docstring for why the border
differs — the kernel is the more accurate of the two there).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from multicam_calibration_tpu.detection.detector import corner_response
from multicam_calibration_tpu.ops.pallas_kernels import corner_response_pallas


@pytest.mark.parametrize(
    "shape",
    [(1, 64, 64), (2, 100, 150), (3, 128, 256), (1, 130, 131)],
)
def test_corner_response_pallas_matches_xla(shape, rng):
    g = jnp.asarray(rng.random(shape))
    ref = np.asarray(corner_response(g, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, interpret=True))
    assert out.shape == ref.shape
    m = 8  # detection masks this border before NMS
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=1e-12
    )


def test_corner_response_pallas_sigma(rng):
    g = jnp.asarray(rng.random((1, 96, 160)))
    ref = np.asarray(corner_response(g, sigma=2.5, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, sigma=2.5, interpret=True))
    m = 12
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=1e-12
    )


def test_corner_response_pallas_finds_saddles(rng):
    # A synthetic checkerboard: response maxima must sit at the X-corners.
    H = W = 96
    y, x = np.mgrid[0:H, 0:W]
    board = ((x // 16 + y // 16) % 2).astype(np.float64)
    g = jnp.asarray(board[None] + 0.01 * rng.random((1, H, W)))
    out = np.asarray(corner_response_pallas(g, interpret=True))[0]
    iy, ix = np.unravel_index(np.argmax(out), out.shape)
    assert iy % 16 in (0, 15) or abs(iy % 16 - 0) <= 1
    assert out.max() > 0
