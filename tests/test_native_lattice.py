"""Native (C++) lattice growth parity vs the numpy oracle.

native/src/lattice.cc re-implements detector._grow_lattice_numpy (score
filter, dedup, pitch, seeded BFS growth) for the host ordering hot path.
The two must agree: same kept candidates, same pitch, same selected corner
set — the lattice coordinate frame itself is arbitrary up to the 8
flip/transpose symmetries (a near-tie in the neighbor distance sort can
mirror the frame; anchor matching resolves orientation downstream), so
grids are compared up to symmetry and detection output end-to-end.
"""
import numpy as np
import pytest

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.detection import native_lattice
from multicam_calibration_tpu.detection.detector import (
    _find_candidates,
    _gray_from_u8,
    _grow_lattice_numpy,
)
from multicam_calibration_tpu.detection.synthetic_images import (
    random_view_homography,
    render_board_view,
)

BOARD = (5, 7)
N_NEEDED = BOARD[0] * BOARD[1]
K_TEST = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
DIST_TEST = np.array([-0.28, 0.12])
HARD_KW = dict(
    camera_matrix=K_TEST, dist_coefs=DIST_TEST, lighting_gradient=0.8,
    vignette=0.4, clutter=6,
)

pytestmark = pytest.mark.skipif(
    not native_lattice.available(), reason="native runtime unavailable"
)


def _view(seed, **kw):
    rng = np.random.default_rng(seed)
    H = random_view_homography(rng, board_shape=BOARD)
    view, gt = render_board_view(
        H, out_size=(480, 640), board_shape=BOARD, noise=1.5, seed=seed, **kw
    )
    return view.astype(np.uint8), gt


def _candidates(view):
    import jax.numpy as jnp

    g = _gray_from_u8(jnp.asarray(view[None]))
    xy, score = _find_candidates(g, 160, 4)
    return np.asarray(xy[0], float), np.asarray(score[0], float)


def _grids_equal_up_to_symmetry(ga, gb):
    """True when the two lattices select the same candidate at every cell
    under one of the 8 flip/transpose coordinate symmetries."""
    if (ga is None) != (gb is None):
        return False
    if ga is None:
        return True
    if len(ga) != len(gb):
        return False
    ka = np.array(list(ga.keys()))
    va = [ga[tuple(k)] for k in ka]
    kb_set = gb
    for swap in (False, True):
        for si in (1, -1):
            for sj in (1, -1):
                t = ka[:, ::-1] if swap else ka
                t = t * np.array([si, sj])
                # Allow a constant translation (grid origins are arbitrary).
                off = None
                ok = True
                for (ij, v) in zip(t, va):
                    match = [
                        k for k, vv in kb_set.items() if vv == v
                    ]
                    if len(match) != 1:
                        ok = False
                        break
                    d = (match[0][0] - ij[0], match[0][1] - ij[1])
                    if off is None:
                        off = d
                    elif d != off:
                        ok = False
                        break
                if ok:
                    return True
    return False


@pytest.mark.parametrize(
    "kw", [{}, dict(camera_matrix=K_TEST, dist_coefs=DIST_TEST), HARD_KW],
    ids=["clean", "distorted", "hard"],
)
def test_native_matches_numpy_growth(kw):
    n_with_grid = 0
    for seed in range(8):
        view, _ = _view(seed, **kw)
        pts, sc = _candidates(view)
        rn = native_lattice.grow_lattice(pts, sc, N_NEEDED, 0.35)
        rp = _grow_lattice_numpy(pts, sc, N_NEEDED, 0.35)
        assert rn is not None
        np.testing.assert_allclose(rn[0], rp[0])
        np.testing.assert_allclose(rn[1], rp[1])
        assert rn[2] == pytest.approx(rp[2], abs=1e-9)
        gn, gp = rn[3], rp[3]
        if gn is not None:
            n_with_grid += 1
            # Same corner set chosen...
            assert set(gn.values()) == set(gp.values())
            # ...and the same lattice up to coordinate symmetry.
            assert _grids_equal_up_to_symmetry(gn, gp)
        else:
            assert gp is None
    assert n_with_grid >= 6  # the corpus must actually exercise growth


def test_no_candidates_and_clutter_only(monkeypatch):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 640, size=(60, 2))
    sc = rng.uniform(0.5, 1.0, size=60)
    rn = native_lattice.grow_lattice(pts, sc, N_NEEDED, 0.35)
    rp = _grow_lattice_numpy(pts, sc, N_NEEDED, 0.35)
    assert (rn[3] is None) == (rp[3] is None)
    # Too few points: both report no grid.
    assert native_lattice.grow_lattice(pts[:10], sc[:10], N_NEEDED, 0.35)[
        3
    ] is None


def test_detect_chessboard_end_to_end_parity(monkeypatch):
    """Full detect_chessboard output is identical with the native stage on
    or off (the device stages are deterministic; only host ordering flips)."""
    for seed in range(4):
        view, _ = _view(seed, **HARD_KW)
        det_native = mct.detect_chessboard(view, board_shape=BOARD)
        monkeypatch.setenv("MCC_NO_NATIVE_LATTICE", "1")
        det_numpy = mct.detect_chessboard(view, board_shape=BOARD)
        monkeypatch.delenv("MCC_NO_NATIVE_LATTICE")
        assert (det_native is None) == (det_numpy is None)
        if det_native is not None:
            np.testing.assert_allclose(
                det_native[0], det_numpy[0], atol=1e-5
            )
