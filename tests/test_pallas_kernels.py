"""Pallas kernel oracle tests (interpreter mode on the CPU test mesh).

The fused corner-response kernel must match the XLA conv implementation
(detection/detector.py:corner_response) away from the 1-pixel border (see
ops/pallas_kernels.py module docstring for why the border differs — the
kernel is the more accurate of the two there). Both paths are driven in
f32 — the kernels are f32 VPU stencils (f64 inputs are downcast at entry,
matching the compiled behavior where enable_x64(False) canonicalizes
them), and production grays are always f32 (_gray_from_u8) — so oracle
agreement is at f32 rounding, not exact.
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
    g = jnp.asarray(rng.random(shape), jnp.float32)
    ref = np.asarray(corner_response(g, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, interpret=True))
    assert out.shape == ref.shape
    m = 8  # detection masks this border before NMS
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=3e-6 * scale
    )


def test_corner_response_pallas_sigma(rng):
    g = jnp.asarray(rng.random((1, 96, 160)), jnp.float32)
    ref = np.asarray(corner_response(g, sigma=2.5, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, sigma=2.5, interpret=True))
    m = 12
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=3e-6 * scale
    )


@pytest.mark.parametrize("sigma", [3.5, 6.0])
def test_corner_response_pallas_coarse_sigmas(rng, sigma):
    """The coarse-retry ladder (_COARSE_SCALES) runs the fused kernel at
    sigma 3.5/6.0 — radius 11/18 halos must stay exact through the tile
    plumbing, not just the default radius-5."""
    g = jnp.asarray(rng.random((1, 128, 192)), jnp.float32)
    ref = np.asarray(corner_response(g, sigma=sigma, use_pallas=False))
    out = np.asarray(corner_response_pallas(g, sigma=sigma, interpret=True))
    m = int(3 * sigma + 0.5) + 4
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(
        out[:, m:-m, m:-m], ref[:, m:-m, m:-m], atol=3e-6 * scale
    )


@pytest.mark.parametrize("shape", [(2, 100, 150), (1, 128, 256)])
def test_fused_peaks_match_xla_nms(shape, rng):
    from jax import lax

    from multicam_calibration_tpu.ops.pallas_kernels import (
        corner_response_peaks_pallas,
    )

    g = jnp.asarray(rng.random(shape), jnp.float32)
    nms = 4
    resp_ref = np.asarray(corner_response(g, use_pallas=False))
    win = 2 * nms + 1
    local_max = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp_ref), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    resp, peak = corner_response_peaks_pallas(g, nms_radius=nms, interpret=True)
    m = nms + 4  # the margin find_corner_candidates masks anyway
    scale = float(np.abs(resp_ref).max())
    np.testing.assert_allclose(
        np.asarray(resp)[:, m:-m, m:-m], resp_ref[:, m:-m, m:-m],
        atol=3e-6 * scale,
    )
    # NMS semantics: the fused peak mask == reduce_window NMS applied to
    # the kernel's OWN response (exact; response rounding tested above).
    local_max_k = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    peak_ref = (np.asarray(resp) >= local_max_k) & (np.asarray(resp) > 0)
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
    g = jnp.asarray(rng.random((1, 160, 224)), jnp.float32)
    resp_ref = np.asarray(corner_response(g, sigma=sigma, use_pallas=False))
    win = 2 * nms + 1
    local_max = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp_ref), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    resp, peak = corner_response_peaks_pallas(
        g, sigma=sigma, nms_radius=nms, interpret=True
    )
    m = int(3 * sigma + 0.5) + nms + 4
    scale = float(np.abs(resp_ref).max())
    np.testing.assert_allclose(
        np.asarray(resp)[:, m:-m, m:-m], resp_ref[:, m:-m, m:-m],
        atol=3e-6 * scale,
    )
    local_max_k = np.asarray(
        lax.reduce_window(
            jnp.asarray(resp), -jnp.inf, lax.max, (1, win, win),
            (1, 1, 1), "SAME",
        )
    )
    peak_ref = (np.asarray(resp) >= local_max_k) & (np.asarray(resp) > 0)
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
    board = ((x // 16 + y // 16) % 2).astype(np.float32)
    g = jnp.asarray(board[None] + 0.005 * rng.random((1, H, W)), jnp.float32)
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
    # Real-corner scores agree at f32 rounding; noise-floor pseudo-peaks
    # (1e-3x the corner response) are compared on response scale, not
    # relative (their relative error is amplified by the tiny magnitude).
    np.testing.assert_allclose(
        np.sort(a), np.sort(b), atol=3e-6 * float(b.max()), rtol=5e-5
    )


def test_corner_response_pallas_finds_saddles(rng):
    # A synthetic checkerboard: response maxima must sit at the X-corners.
    H = W = 96
    y, x = np.mgrid[0:H, 0:W]
    board = ((x // 16 + y // 16) % 2).astype(np.float32)
    g = jnp.asarray(board[None] + 0.01 * rng.random((1, H, W)), jnp.float32)
    out = np.asarray(corner_response_pallas(g, interpret=True))[0]
    iy, ix = np.unravel_index(np.argmax(out), out.shape)
    assert iy % 16 in (0, 15) or abs(iy % 16 - 0) <= 1
    assert out.max() > 0


def test_corner_peaks_vmem_danger_window_slabs():
    """Regression (round-4/5 battery failures): when the corner-peaks
    outputs FIT under XLA:TPU's 16 MB scoped-vmem window, layout
    assignment may place them in VMEM; the custom call's actual scoped
    stack is ~2x(outputs + staged input) + scratch (r5 hardware: B=2
    sigma=9 measured 19.96 MB vs the 16 MB limit — the r4 1x model
    under-counted). The wrapper slabs the batch in exactly that window.
    This pins (a) that the crafted shape really lands in the window per
    the wrapper's own arithmetic and (b) that slabbed == direct bitwise.
    """
    from multicam_calibration_tpu.ops.pallas_kernels import (
        _round_up, corner_response_peaks_pallas,
    )

    B, H, W, sigma, tile_h = 4, 512, 640, 1.5, 64
    # Mirror the wrapper's arithmetic to assert the branch actually fires.
    rg = int(3 * sigma + 0.5)
    halo = rg + 1 + 4
    hp = _round_up(H, tile_h)
    copy_h = _round_up(tile_h + 2 * halo, 8)
    wp = _round_up(W + 2 * halo, 128)
    wo = wp - 2 * halo
    itemsize = 4  # the kernels are f32 (f64 inputs are downcast at entry)
    out_el = 2 * hp * wo
    in_el = (hp + copy_h - tile_h) * wp
    stack_per_frame = 2 * (out_el + in_el) * itemsize
    fixed = copy_h * wp * itemsize
    out_total = B * out_el * itemsize
    max_b = max(1, ((12 << 20) - fixed) // stack_per_frame)
    assert out_total < (16 << 20)
    assert B * stack_per_frame + fixed > (12 << 20)
    assert B > max_b  # the slab branch fires for this shape

    rng = np.random.default_rng(3)
    gray = jnp.asarray(rng.random((B, H, W)), jnp.float32)
    r_slab, p_slab = corner_response_peaks_pallas(
        gray, sigma=sigma, nms_radius=4, interpret=True
    )
    rs, ps = zip(*(
        corner_response_peaks_pallas(
            gray[i : i + 1], sigma=sigma, nms_radius=4, interpret=True
        )
        for i in range(B)
    ))
    np.testing.assert_array_equal(
        np.asarray(r_slab), np.asarray(jnp.concatenate(rs))
    )
    np.testing.assert_array_equal(
        np.asarray(p_slab), np.asarray(jnp.concatenate(ps))
    )
