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


@pytest.mark.parametrize("sigma", [3.5, 6.0])
def test_corner_response_pallas_coarse_sigmas(rng, sigma):
    """The coarse-retry ladder (_COARSE_SCALES) runs the fused kernel at
    sigma 3.5/6.0 — radius 11/18 halos must stay exact through the tile
    plumbing, not just the default radius-5."""
    g = jnp.asarray(rng.random((1, 128, 192)))
    ref = np.asarray(corner_response(g, sigma=sigma, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, sigma=sigma, interpret=True))
    m = int(3 * sigma + 0.5) + 4
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=1e-10
    )


@pytest.mark.parametrize("shape", [(2, 100, 150), (1, 128, 256)])
def test_fused_peaks_match_xla_nms(shape, rng):
    from jax import lax

    from multicam_calibration_tpu.ops.pallas_kernels import (
        corner_response_peaks_pallas,
    )

    g = jnp.asarray(rng.random(shape))
    nms = 4
    resp_ref = np.asarray(corner_response(g, use_pallas=False))
    win = 2 * nms + 1
    local_max = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp_ref), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    peak_ref = (resp_ref >= local_max) & (resp_ref > 0)
    resp, peak = corner_response_peaks_pallas(g, nms_radius=nms, interpret=True)
    m = nms + 4  # the margin find_corner_candidates masks anyway
    np.testing.assert_allclose(
        np.asarray(resp)[:, m:-m, m:-m], resp_ref[:, m:-m, m:-m], atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(peak)[:, m:-m, m:-m], peak_ref[:, m:-m, m:-m]
    )


def test_fused_peaks_coarse_sigma(rng):
    """Fused response+NMS at the coarse-retry ladder's sigma=6 (radius-18
    halo through the tile plumbing)."""
    from jax import lax

    from multicam_calibration_tpu.ops.pallas_kernels import (
        corner_response_peaks_pallas,
    )

    sigma, nms = 6.0, 4
    g = jnp.asarray(rng.random((1, 160, 224)))
    resp_ref = np.asarray(corner_response(g, sigma=sigma, use_pallas=False))
    win = 2 * nms + 1
    local_max = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp_ref), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    peak_ref = (resp_ref >= local_max) & (resp_ref > 0)
    resp, peak = corner_response_peaks_pallas(
        g, sigma=sigma, nms_radius=nms, interpret=True
    )
    m = int(3 * sigma + 0.5) + nms + 4
    np.testing.assert_allclose(
        np.asarray(resp)[:, m:-m, m:-m], resp_ref[:, m:-m, m:-m], atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(peak)[:, m:-m, m:-m], peak_ref[:, m:-m, m:-m]
    )


def test_find_corner_candidates_fused_path_matches(rng):
    """Candidate positions/scores from the fused kernel reproduce the XLA
    reduce_window path exactly (their shared border margin masks the only
    pixels where the two NMS boundary conventions differ)."""
    from multicam_calibration_tpu.detection.detector import (
        find_corner_candidates,
    )
    from multicam_calibration_tpu.ops.pallas_kernels import (
        corner_response_peaks_pallas,
    )
    import jax
    from jax import lax as jlax

    H = W = 96
    y, x = np.mgrid[0:H, 0:W]
    board = ((x // 16 + y // 16) % 2).astype(np.float64)
    g = jnp.asarray(board[None] + 0.005 * rng.random((1, H, W)))
    xy_a, s_a = find_corner_candidates(g, max_candidates=32, use_pallas=False)

    resp, is_peak = corner_response_peaks_pallas(g, interpret=True)
    B, Hh, Ww = resp.shape
    ys = jnp.arange(Hh)[None, :, None]
    xs = jnp.arange(Ww)[None, None, :]
    margin = 4 + 4  # nms_radius + 4, as in find_corner_candidates
    interior = (
        (ys >= margin) & (ys < Hh - margin) & (xs >= margin) & (xs < Ww - margin)
    )
    masked = jnp.where(is_peak & interior, resp, 0.0)
    s_b, idx = jax.lax.top_k(masked.reshape(B, -1), 32)
    a = np.asarray(s_a)[np.asarray(s_a) > 0]
    b = np.asarray(s_b)[np.asarray(s_b) > 0]
    assert a.shape == b.shape
    np.testing.assert_allclose(np.sort(a), np.sort(b), rtol=1e-10)


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
