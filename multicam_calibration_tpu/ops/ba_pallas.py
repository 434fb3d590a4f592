"""Fused Pallas TPU kernel for the bundle-adjustment block build.

The Schur-LM iteration is dominated by ``build_normal_blocks`` (measured 90%
of config-5 iteration wall): the XLA analytic path materializes the Jacobian
blocks A (C,F,N,2,12) / B (C,F,N,2,6) plus ~10 chain intermediates in HBM
per frame chunk, and runs the residual chain in emulated f64 (measured 1.8x
the whole build by itself). This kernel fuses the ENTIRE per-chunk
linearization into one pass:

- **Two-float residual**: the prediction chain runs in compensated
  (hi, lo) float32-pair arithmetic (Dekker/Knuth two-sum/two-prod) — ~1e-13
  relative accuracy, preserving the f64-residual contract (CLAUDE.md: the
  f64 RESIDUAL/GRADIENT path anchors the optimum) without XLA's emulated-f64
  HBM traffic. Verified against the f64 oracle in
  tests/test_ba_pallas.py.
- **Zero Jacobian HBM traffic**: A/B rows live in VMEM registers only; the
  U/V/W/g contractions happen in the same pass that builds them.
- **Lane layout**: each grid step processes (camera c, Tf frames); every
  per-observation tensor is (Tf, 128) — frame on sublanes, the frame's
  N*2 = 70 (point, u/v) pairs on lanes (zero-padded to the 128-lane tile).
  Per-point chain values are duplicated over each point's two u/v lanes;
  u/v-dependent rows select by lane parity.

Outputs keep lm_core's chunked-precision contract exactly: U fragments and
V accumulate in f32 within the chunk (block_dtype), per-(c,f) gradient and
cost fragments are emitted f32 and reduced over the frame/camera axis in
f64 OUTSIDE the kernel (grad_dtype/data-dtype contract).

Reference being replaced: scipy least_squares' finite-difference grouped
Jacobian + TRF internals (reference bundle_adjustment.py:301-313).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import on_tpu

__all__ = ["ba_chunk_blocks", "ba_chunk_cost", "ba_prepare_obs", "LANES"]

LANES = 128  # one VPU lane tile; N*2 <= LANES observations per frame


def _out_sds(args):
    """ShapeDtypeStruct factory honoring shard_map varying-mesh-axes.

    Inside ``shard_map`` (check_vma default-on since jax 0.9) a
    ``pallas_call``'s out_shape must declare how outputs vary across mesh
    axes or tracing raises — the exact first-execution crash a multi-chip
    auto-routing of this kernel would hit (caught by
    tests/test_ba_pallas.py::TestShardMapPallas). Outputs vary over the
    union of the inputs' vma (the per-shard fragments are frame-local)."""
    try:
        vma = frozenset().union(*(jax.typeof(a).vma for a in args))
    except (AttributeError, TypeError):  # pragma: no cover - old jax
        vma = None

    def sds(shape, dtype):
        if vma:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
        return jax.ShapeDtypeStruct(shape, dtype)

    return sds


# ---------------------------------------------------------------------------
# Two-float (double-f32) helpers — error-free transforms, branch-free.
# Safe under XLA/Mosaic: float ops are not reassociated; a*b+c may fuse to
# an FMA, which only makes the Dekker error terms MORE exact.
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    c = 4097.0 * a  # Veltkamp splitter for f32 (2^12 + 1)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _dd_renorm(s, e):
    hi = s + e
    return hi, e - (hi - s)


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    return _dd_renorm(s, e + (xl + yl))


def _dd_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    return _dd_renorm(p, e + (xh * yl + xl * yh))


def _dd_div(xh, xl, yh, yl):
    q1 = xh / yh
    ph, plo = _dd_mul(yh, yl, q1, jnp.zeros_like(q1))
    rh, rl = _dd_add(xh, xl, -ph, -plo)
    q2 = (rh + rl) / yh
    return _dd_renorm(q1, q2)


def _dd_scale(xh, xl, c):
    """dd * exact-f32 constant."""
    p, e = _two_prod(xh, c)
    return _dd_renorm(p, e + xl * c)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _lane_masks(n2, Tf):
    """(is_u, is_v) f32 lane-parity masks: even lane = u of point
    lane//2, odd = v; lanes >= n2 are padding (zero in both). Explicit
    int32 bitwise/compare ops and pinned-f32 where-scalars: a bare `% 2`
    or python-float scalar drags int64/f64 constants through Mosaic
    under x64, which it cannot lay out."""
    one32 = jnp.float32(1.0)
    zero32 = jnp.float32(0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tf, LANES), 1)
    live = lane < jnp.int32(n2)
    even = jnp.bitwise_and(lane, jnp.int32(1)) == jnp.int32(0)
    is_u = jnp.where(live & even, one32, zero32)
    is_v = jnp.where(live & ~even, one32, zero32)
    return is_u, is_v


def _chain_residual(
    c, cam_ref, rc_ref, pw_h, pw_l, is_u, is_v, m, o_h, o_l,
):
    """Two-float prediction chain + masked residual for camera row ``c``.

    Shared by the block-build kernel (which also consumes the chain's hi
    parts for the analytic Jacobian rows) and the cost-only kernel.
    Returns ``(r, chain)`` with ``chain`` a dict of the per-lane hi
    values and camera scalars the Jacobian section needs.
    """
    one32 = jnp.float32(1.0)
    zero32 = jnp.float32(0.0)

    def cam_dd(i):  # hi/lo scalar pair from the SMEM camera pack
        return cam_ref[c, 2 * i], cam_ref[c, 2 * i + 1]

    fx_h, fx_l = cam_dd(0)
    fy_h, fy_l = cam_dd(1)
    cx_h, cx_l = cam_dd(2)
    cy_h, cy_l = cam_dd(3)
    k1_h, k1_l = cam_dd(4)
    k2_h, k2_l = cam_dd(5)
    t_h = [cam_ref[c, 12 + 2 * i] for i in range(3)]
    t_l = [cam_ref[c, 13 + 2 * i] for i in range(3)]
    rc_h = [rc_ref[c, i] for i in range(9)]
    rc_l = [rc_ref[c, 9 + i] for i in range(9)]

    # --- two-float prediction chain ------------------------------------
    q_h, q_l = [], []
    for i in range(3):
        ah, al = _dd_scale(pw_h[0], pw_l[0], rc_h[3 * i + 0])
        # rc lo corrections enter once per product: rc = (h + l), so
        # rc*pw = h*pw (dd) + l*pw_h (f32-level term).
        al = al + rc_l[3 * i + 0] * pw_h[0]
        for j in (1, 2):
            bh, bl = _dd_scale(pw_h[j], pw_l[j], rc_h[3 * i + j])
            bl = bl + rc_l[3 * i + j] * pw_h[j]
            ah, al = _dd_add(ah, al, bh, bl)
        qh_i, ql_i = _dd_add(ah, al, t_h[i], t_l[i])
        q_h.append(qh_i)
        q_l.append(ql_i)

    # Masked lanes (zero-weight observations, frame padding, lane
    # padding) take the benign z=1 branch. This is CORRECTNESS, not
    # hygiene: padded frames carry zero poses, so board points sit in
    # the z=0 plane and a camera with near-zero extrinsics (the gauge
    # root after any small step/perturbation) sees |z| ~ 1e-5..1e-3 —
    # small enough that the 1/z Jacobian chain overflows f32 and the
    # masked contraction computes inf * 0 = NaN, poisoning U and
    # rejecting every LM step (the round-4 bench.py failure mode; the
    # exact-zero case was already caught by the 1e-12 guard, which is
    # why descents from the UNperturbed x0 worked).
    z_h, z_l = q_h[2], q_l[2]
    bad_z = (jnp.abs(z_h) < jnp.float32(1e-12)) | (m == zero32)
    z_h = jnp.where(bad_z, one32, z_h)
    z_l = jnp.where(bad_z, zero32, z_l)
    iz_h, iz_l = _dd_div(
        jnp.ones_like(z_h), jnp.zeros_like(z_h), z_h, z_l
    )
    x_h, x_l = _dd_mul(q_h[0], q_l[0], iz_h, iz_l)
    y_h, y_l = _dd_mul(q_h[1], q_l[1], iz_h, iz_l)
    xx_h, xx_l = _dd_mul(x_h, x_l, x_h, x_l)
    yy_h, yy_l = _dd_mul(y_h, y_l, y_h, y_l)
    r2_h, r2_l = _dd_add(xx_h, xx_l, yy_h, yy_l)
    # s = 1 + r2*(k1 + r2*k2)
    a_h, a_l = _dd_mul(r2_h, r2_l, k2_h * jnp.ones_like(r2_h),
                       k2_l * jnp.ones_like(r2_h))
    a_h, a_l = _dd_add(a_h, a_l, k1_h * jnp.ones_like(r2_h),
                       k1_l * jnp.ones_like(r2_h))
    a_h, a_l = _dd_mul(a_h, a_l, r2_h, r2_l)
    s_h, s_l = _dd_add(a_h, a_l, jnp.ones_like(a_h),
                       jnp.zeros_like(a_h))
    xd_h, xd_l = _dd_mul(x_h, x_l, s_h, s_l)
    yd_h, yd_l = _dd_mul(y_h, y_l, s_h, s_l)
    # pred = f_sel * d_sel + c_sel  (lane-selected u/v)
    d_h = is_u * xd_h + is_v * yd_h
    d_l = is_u * xd_l + is_v * yd_l
    f_h = is_u * fx_h + is_v * fy_h
    f_l = is_u * fx_l + is_v * fy_l
    c_h = is_u * cx_h + is_v * cy_h
    c_l = is_u * cx_l + is_v * cy_l
    p_h, p_l = _dd_mul(d_h, d_l, f_h, f_l)
    p_h, p_l = _dd_add(p_h, p_l, c_h, c_l)
    # residual r = obs - pred, masked; hi absorbs the compensated parts
    r_h, r_l = _dd_add(o_h, o_l, -p_h, -p_l)
    r = (r_h + r_l) * m
    chain = dict(
        x_h=x_h, y_h=y_h, r2_h=r2_h, s_h=s_h, iz_h=iz_h,
        xd_h=xd_h, yd_h=yd_h, f_h=f_h, q_h=q_h, t_h=t_h,
        k1_h=k1_h, k2_h=k2_h, rc_h=rc_h,
    )
    return r, chain


def _robust_rho_w(r, m, f_scale, loss_linear):
    """Per-lane robust cost fragment and IRLS weight (f32)."""
    if loss_linear:
        w = m
        rho = 0.5 * (r * r)  # _robust_cost's 0.5*sum(r2) contract
    else:
        z = (r * r) * (1.0 / (f_scale * f_scale))
        w = m * jax.lax.rsqrt(jnp.sqrt(1.0 + z))
        rho = (f_scale * f_scale) * (jnp.sqrt(1.0 + z) - 1.0)
    return rho, w


def _ba_kernel(
    n2, f_scale, loss_linear, Tc,
    cam_ref, rc_ref, jlc_ref, posef_ref, pw_ref, obs_h_ref, obs_l_ref,
    msk_ref,
    ufrag_ref, v_ref, w_ref, gcam_ref, gpose_ref, cost_ref,
):
    """One (Tc-camera x Tf-frame) tile of the fused block build.

    Refs:
      cam_ref   (C, 24) SMEM: hi/lo pairs of [fx fy cx cy k1 k2 | tvec]
      rc_ref    (C, 18) SMEM: R_c row-major hi (9) + lo (9)
      jlc_ref   (C, 9)  SMEM: so3_left_jacobian(rvec) f32
      posef_ref (Tf, 12): [t_p f32 (3) | Jl_p row-major (9)]
      pw_ref    (Tf, 6, LANES): board points in WORLD frame, per-lane
                duplicated over u/v: [hi xyz | lo xyz]
      obs_*_ref (Tc, Tf, LANES) hi/lo observation coords, msk 0/1
    Outputs:
      ufrag_ref (1, Tc, 12, 12)  v_ref (Tf, 36) accumulated over camera
      steps  w_ref (Tc, Tf, 72)  gcam_ref (Tc, Tf, 12)
      gpose_ref (Tc, Tf, 6)  cost_ref (Tc, Tf, 1)

    The per-frame geometry (world points, pose translation, Jl_p, lane
    masks) is computed ONCE per grid step and shared by the Tc cameras of
    the in-kernel fori loop — the loop amortizes grid-step overhead and
    the pw DMA across cameras.
    """
    cj = pl.program_id(1)
    Tf = pw_ref.shape[0]
    is_u, is_v = _lane_masks(n2, Tf)

    pw_h = [pw_ref[:, i, :] for i in range(3)]  # (Tf, LANES) each
    pw_l = [pw_ref[:, 3 + i, :] for i in range(3)]
    tp = [posef_ref[:, i][:, None] for i in range(3)]  # (Tf, 1)
    jlp = [posef_ref[:, 3 + i][:, None] for i in range(9)]
    rb = [pw_h[i] - tp[i] for i in range(3)]  # R_p b = p_w - t_p

    def cam_body(k, V_acc):
        c = cj * Tc + k
        m = msk_ref[k]
        r, ch = _chain_residual(
            c, cam_ref, rc_ref, pw_h, pw_l, is_u, is_v, m,
            obs_h_ref[k], obs_l_ref[k],
        )
        q_h = ch["q_h"]
        t_h = ch["t_h"]
        k1_h, k2_h = ch["k1_h"], ch["k2_h"]
        rc_h = ch["rc_h"]
        xd_h, yd_h = ch["xd_h"], ch["yd_h"]

        # --- robust weights + cost (f32: smooth functions of accurate r) --
        rho, w = _robust_rho_w(r, m, f_scale, loss_linear)
        cost_ref[k] = jnp.sum(rho * m, axis=1, keepdims=True)

        # --- f32 Jacobian rows (per-lane), from the chain's hi parts ------
        x = ch["x_h"]
        y = ch["y_h"]
        r2 = ch["r2_h"]
        s = ch["s_h"]
        iz = ch["iz_h"]
        sp = k1_h + 2.0 * k2_h * r2
        d11 = s + 2.0 * x * x * sp
        d12 = 2.0 * x * y * sp
        d22 = s + 2.0 * y * y * sp
        fsel = ch["f_h"]
        m0 = fsel * iz * (is_u * d11 + is_v * d12)
        m1 = fsel * iz * (is_u * d12 + is_v * d22)
        m2 = -(m0 * x + m1 * y)
        M = [m0, m1, m2]  # d(pred_lane)/dq
        # camera-frame point (rotation columns): w_cam = q - t = R_c p_w
        wc = [q_h[i] - t_h[i] for i in range(3)]
        cr = [
            wc[1] * M[2] - wc[2] * M[1],
            wc[2] * M[0] - wc[0] * M[2],
            wc[0] * M[1] - wc[1] * M[0],
        ]
        jlc = [jlc_ref[c, i] for i in range(9)]
        A_rot = [
            cr[0] * jlc[3 * 0 + i] + cr[1] * jlc[3 * 1 + i]
            + cr[2] * jlc[3 * 2 + i]
            for i in range(3)
        ]
        xy_sel = is_u * x + is_v * y
        A = [
            is_u * xd_h,                # d/dfx
            is_v * yd_h,                # d/dfy
            is_u,                       # d/dcx
            is_v,                       # d/dcy
            fsel * xy_sel * r2,         # d/dk1
            fsel * xy_sel * r2 * r2,    # d/dk2
            A_rot[0], A_rot[1], A_rot[2],
            M[0], M[1], M[2],           # d/dt_c
        ]
        # pose blocks: Mc = M . R_c ; B_rot = cross(R_p b, Mc) . Jl_p
        Mc = [
            M[0] * rc_h[0 + i] + M[1] * rc_h[3 + i] + M[2] * rc_h[6 + i]
            for i in range(3)
        ]
        crb = [
            rb[1] * Mc[2] - rb[2] * Mc[1],
            rb[2] * Mc[0] - rb[0] * Mc[2],
            rb[0] * Mc[1] - rb[1] * Mc[0],
        ]
        B_rot = [
            crb[0] * jlp[3 * 0 + i] + crb[1] * jlp[3 * 1 + i]
            + crb[2] * jlp[3 * 2 + i]
            for i in range(3)
        ]
        B = [B_rot[0], B_rot[1], B_rot[2], Mc[0], Mc[1], Mc[2]]

        Aw = [a * w for a in A]
        Bw = [b * w for b in B]
        rw = r * w

        # --- contractions --------------------------------------------------
        # (12, Tf*LANES) @ (Tf*LANES, 12) on the MXU; Mosaic's tpu.matmul
        # requires single contracting dims, hence the explicit collapse.
        # precision=HIGHEST is load-bearing ON HARDWARE: preferred_element_
        # type only pins the f32 accumulator; without an explicit precision
        # the MXU truncates the f32 OPERANDS to one bf16 pass (~0.4%
        # entrywise error in U — the compiled-vs-interpret divergence class
        # that shipped in round 3; lm_solve's with_highest_precision
        # context does not reach inside a Pallas kernel).
        A2 = jnp.stack([a.reshape(-1) for a in Aw])
        U = jax.lax.dot_general(
            A2, A2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ufrag_ref[0, k] = U
        # per-frame contractions: V_f, W_f, g fragments (lane reductions)
        v_rows = [jnp.sum(Bw[i] * Bw[j], axis=1, keepdims=True)
                  for i in range(6) for j in range(6)]
        w_rows = [jnp.sum(Aw[i] * Bw[j], axis=1, keepdims=True)
                  for i in range(12) for j in range(6)]
        w_ref[k] = jnp.concatenate(w_rows, axis=1)  # (Tf, 72)
        gcam_ref[k] = jnp.concatenate(
            [jnp.sum(a * rw, axis=1, keepdims=True) for a in Aw], axis=1
        )
        gpose_ref[k] = jnp.concatenate(
            [jnp.sum(b * rw, axis=1, keepdims=True) for b in Bw], axis=1
        )
        return V_acc + jnp.concatenate(v_rows, axis=1)

    V_acc = jax.lax.fori_loop(
        0, Tc, cam_body, jnp.zeros((Tf, 36), jnp.float32)
    )

    @pl.when(cj == 0)
    def _():
        v_ref[:] = jnp.zeros_like(v_ref)

    v_ref[:] = v_ref[:] + V_acc


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _hilo(x):
    """f64 array -> (hi, lo) f32 pair (lossless two-float split)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def ba_prepare_obs(obs, mask):
    """Pack observations once per solve into the kernel's lane layout.

    obs (C, F, N, 2) f64 (or f32), mask (C, F, N) bool ->
    (obs_hi, obs_lo, msk) each (C, F, LANES) f32, lanes = (n, uv) pairs
    zero-padded to LANES. Constant across LM iterations — callers hoist it
    out of the optimizer loop.
    """
    C, F, N, _ = obs.shape
    if N * 2 > LANES:
        raise ValueError(f"N*2 = {N*2} exceeds the {LANES}-lane kernel tile")
    obs = jnp.where(mask[..., None], jnp.nan_to_num(obs), 0.0)
    flat = obs.reshape(C, F, N * 2)
    hi, lo = _hilo(flat) if obs.dtype == jnp.float64 else (
        flat.astype(jnp.float32), jnp.zeros(flat.shape, jnp.float32))
    pad = LANES - N * 2
    widths = ((0, 0), (0, 0), (0, pad))
    msk = jnp.pad(
        jnp.repeat(mask, 2, axis=-1).astype(jnp.float32), widths
    )
    return jnp.pad(hi, widths), jnp.pad(lo, widths), msk


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "f_scale", "loss_linear", "tile_f",
                     "tile_c", "interpret"),
)
def _ba_chunk_blocks(
    cam_pack, rc_pack, jlc_pack, posef, pw_pack, obs_hi, obs_lo, msk,
    n_points, f_scale=1.0, loss_linear=False, tile_f=128, tile_c=8,
    interpret=False,
):
    C = cam_pack.shape[0]
    Fk = posef.shape[0]
    Tf = min(tile_f, Fk)
    if Fk % Tf:
        raise ValueError(f"frame chunk {Fk} not divisible by tile {Tf}")
    nF = Fk // Tf
    Tc = next(t for t in (tile_c, 8, 6, 4, 3, 2, 1) if C % t == 0)
    nC = C // Tc

    grid = (nF, nC)  # camera minor: V blocks revisit consecutively
    kernel = functools.partial(
        _ba_kernel, n_points * 2, float(f_scale), bool(loss_linear), Tc
    )
    # x64 OFF around the pallas_call: under jax_enable_x64 the grid index
    # maps trace as int64, which Mosaic cannot legalize (observed:
    # 'func.return (i64, i64) failed to legalize'). Everything in the
    # kernel is explicit f32/int32, so the config flip changes nothing
    # else.
    with jax.enable_x64(False):
        out = _pallas(
            kernel, grid, Tf, Tc, nF, nC, C, Fk, interpret,
            (cam_pack, rc_pack, jlc_pack, posef, pw_pack, obs_hi, obs_lo,
             msk),
        )
    return out[:5] + (out[5][..., 0],)


def _pallas(kernel, grid, Tf, Tc, nF, nC, C, Fk, interpret, args):
    sds = _out_sds(args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Per-camera scalar packs: whole arrays in SMEM (tiny), indexed
            # by program_id * Tc + k inside the kernel — blocked specs
            # would need (8, 128)-aligned trailing dims.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Tf, 12), lambda fi, cj: (fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tf, 6, LANES), lambda fi, cj: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Tc, 12, 12), lambda fi, cj: (fi, cj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tf, 36), lambda fi, cj: (fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, 72), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, 12), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, 6), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc, Tf, 1), lambda fi, cj: (cj, fi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            sds((nF, C, 12, 12), jnp.float32),
            sds((Fk, 36), jnp.float32),
            sds((C, Fk, 72), jnp.float32),
            sds((C, Fk, 12), jnp.float32),
            sds((C, Fk, 6), jnp.float32),
            sds((C, Fk, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*args)


def ba_chunk_blocks(
    cam_params, pose_k, obs_hi, obs_lo, msk, objpoints,
    f_scale=1.0, loss_linear=False, tile_f=64, tile_c=16, interpret=None,
):
    """Fused block build for one frame chunk.

    cam_params (C, 12) f64, pose_k (Fk, 6) f64, obs_hi/obs_lo/msk from
    :func:`ba_prepare_obs` (sliced to the chunk), objpoints (N, 3) f64.

    ``tile_c=16`` measured 2x faster than 8 at 64 cameras (the in-kernel
    camera fori amortizes grid-step overhead and the pw DMA over more
    cameras); small rigs fall down the divisor ladder unchanged, and
    tile_f > 64 fails to compile (tpu_compile_helper crash) so 64 stays
    the frame tile.
    Returns (U (C,12,12), V (Fk,6,6), W (C,Fk,12,6), g_cam (C,Fk,12),
    g_pose (C,Fk,6), cost (C,Fk)) — all f32 fragments; the caller applies
    lm_core's dtype contracts (f32 in-chunk accumulation, f64 frame/camera
    gradient and cost reductions).
    """
    import sys

    from .rotation import so3_exp, so3_left_jacobian

    # The unrolled two-float chain + 12x6 contraction lists build a deep
    # jaxpr; CPython's default 1000-frame limit aborts Mosaic lowering.
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    if interpret is None:
        interpret = not on_tpu()
    C = cam_params.shape[0]
    Fk = pose_k.shape[0]
    N = objpoints.shape[0]
    f64 = cam_params.dtype == jnp.float64

    # Pad the frame axis to the tile size: zero poses give a finite chain
    # and the zero observation mask kills every padded contribution.
    F0 = Fk
    Tf = min(tile_f, Fk) if Fk % min(tile_f, Fk) == 0 else tile_f
    pad = (-Fk) % Tf
    if pad:
        pose_k = jnp.pad(pose_k, ((0, pad), (0, 0)))
        obs_hi, obs_lo, msk = (
            jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            for x in (obs_hi, obs_lo, msk)
        )
        Fk = Fk + pad

    def hilo(x):
        if f64:
            return _hilo(x)
        return x.astype(jnp.float32), jnp.zeros(x.shape, jnp.float32)

    # Camera pack: [fx fy cx cy k1 k2 | tvec] hi/lo interleaved -> (C, 24)
    intr_t = jnp.concatenate([cam_params[:, :6], cam_params[:, 9:12]], -1)
    ih, il = hilo(intr_t)
    cam_pack = jnp.stack([ih, il], -1).reshape(C, 18)
    cam_pack = jnp.pad(cam_pack, ((0, 0), (0, 6)))
    R_c = so3_exp(cam_params[:, 6:9])
    rch, rcl = hilo(R_c.reshape(C, 9))
    rc_pack = jnp.concatenate([rch, rcl], -1)  # (C, 18)
    jlc_pack = so3_left_jacobian(cam_params[:, 6:9]).astype(
        jnp.float32).reshape(C, 9)

    R_p = so3_exp(pose_k[:, :3])
    p_w = jnp.einsum("nj,fij->fni", objpoints, R_p) + pose_k[:, None, 3:]
    pwh, pwl = hilo(p_w)  # (Fk, N, 3)

    def lanes(x):  # (Fk, N, 3) -> (Fk, 3, LANES) u/v-duplicated
        x = jnp.repeat(x.transpose(0, 2, 1), 2, axis=-1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, LANES - 2 * N)))

    pw_pack = jnp.concatenate([lanes(pwh), lanes(pwl)], axis=1)  # (Fk,6,LANES)
    posef = jnp.concatenate(
        [
            pose_k[:, 3:].astype(jnp.float32),
            so3_left_jacobian(pose_k[:, :3]).astype(jnp.float32).reshape(
                Fk, 9),
        ],
        axis=-1,
    )  # (Fk, 12)

    U_f, V_f, W_f, gcam, gpose, cost = _ba_chunk_blocks(
        cam_pack, rc_pack, jlc_pack, posef, pw_pack,
        obs_hi, obs_lo, msk,
        n_points=N, f_scale=float(f_scale), loss_linear=bool(loss_linear),
        tile_f=Tf, tile_c=int(tile_c), interpret=bool(interpret),
    )
    U = U_f.sum(0)  # f32 in-chunk accumulation (block_dtype contract)
    V = V_f.reshape(Fk, 6, 6)[:F0]
    W = W_f.reshape(C, Fk, 12, 6)[:, :F0]
    return U, V, W, gcam[:, :F0], gpose[:, :F0], cost[:, :F0]


# ---------------------------------------------------------------------------
# Cost-only kernel: the per-damping-try robust cost evaluation. Reuses the
# block-build kernel's two-float prediction chain (same accuracy contract
# as the f64 residual) but emits ONLY per-(c, f) cost fragments — the LM
# damping loop evaluates cost at 1-3 trial points per iteration, so after
# the fused block build this is the next-largest per-iteration term.
# ---------------------------------------------------------------------------


def _cost_kernel(
    n2, f_scale, loss_linear, Tc,
    cam_ref, rc_ref, pw_ref, obs_h_ref, obs_l_ref, msk_ref,
    cost_ref,
):
    """One (Tc-camera x Tf-frame) tile of the fused cost evaluation."""
    cj = pl.program_id(1)
    Tf = pw_ref.shape[0]
    is_u, is_v = _lane_masks(n2, Tf)
    pw_h = [pw_ref[:, i, :] for i in range(3)]
    pw_l = [pw_ref[:, 3 + i, :] for i in range(3)]

    def cam_body(k, carry):
        c = cj * Tc + k
        m = msk_ref[k]
        r, _ = _chain_residual(
            c, cam_ref, rc_ref, pw_h, pw_l, is_u, is_v, m,
            obs_h_ref[k], obs_l_ref[k],
        )
        rho, _ = _robust_rho_w(r, m, f_scale, loss_linear)
        cost_ref[k] = jnp.sum(rho * m, axis=1, keepdims=True)
        return carry

    jax.lax.fori_loop(0, Tc, cam_body, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "f_scale", "loss_linear", "tile_f",
                     "tile_c", "interpret"),
)
def _ba_chunk_cost(
    cam_pack, rc_pack, pw_pack, obs_hi, obs_lo, msk,
    n_points, f_scale=1.0, loss_linear=False, tile_f=128, tile_c=8,
    interpret=False,
):
    C = cam_pack.shape[0]
    Fk = pw_pack.shape[0]
    Tf = min(tile_f, Fk)
    if Fk % Tf:
        raise ValueError(f"frame chunk {Fk} not divisible by tile {Tf}")
    nF = Fk // Tf
    Tc = next(t for t in (tile_c, 8, 6, 4, 3, 2, 1) if C % t == 0)
    nC = C // Tc

    grid = (nF, nC)
    kernel = functools.partial(
        _cost_kernel, n_points * 2, float(f_scale), bool(loss_linear), Tc
    )
    # x64 OFF around the pallas_call (see _ba_chunk_blocks).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((Tf, 6, LANES), lambda fi, cj: (fi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tc, Tf, LANES), lambda fi, cj: (cj, fi, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (Tc, Tf, 1), lambda fi, cj: (cj, fi, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=_out_sds(
                (cam_pack, rc_pack, pw_pack, obs_hi, obs_lo, msk)
            )((C, Fk, 1), jnp.float32),
            interpret=interpret,
        )(cam_pack, rc_pack, pw_pack, obs_hi, obs_lo, msk)
    return out[..., 0]


def ba_chunk_cost(
    cam_params, pose_k, obs_hi, obs_lo, msk, objpoints,
    f_scale=1.0, loss_linear=False, tile_f=64, tile_c=16, interpret=None,
):
    """Fused robust-cost evaluation for one frame chunk.

    Same inputs as :func:`ba_chunk_blocks`; returns per-(c, f) f32 cost
    fragments (C, Fk) — the caller reduces in the data dtype (the
    cost-reduction contract `compute_cost` uses). The residual runs the
    SAME two-float chain as the block build, i.e. f64-grade accuracy —
    strictly tighter than the XLA `cost_dtype="float32"` path it can
    replace (which projects in plain f32).

    Replaces the residual evaluations scipy's TRF performs per trial step
    (reference bundle_adjustment.py:66-98, :301-313).
    """
    import sys

    from .rotation import so3_exp

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    if interpret is None:
        interpret = not on_tpu()
    C = cam_params.shape[0]
    Fk = pose_k.shape[0]
    N = objpoints.shape[0]
    f64 = cam_params.dtype == jnp.float64

    F0 = Fk
    Tf = min(tile_f, Fk) if Fk % min(tile_f, Fk) == 0 else tile_f
    pad = (-Fk) % Tf
    if pad:
        pose_k = jnp.pad(pose_k, ((0, pad), (0, 0)))
        obs_hi, obs_lo, msk = (
            jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            for x in (obs_hi, obs_lo, msk)
        )
        Fk = Fk + pad

    def hilo(x):
        if f64:
            return _hilo(x)
        return x.astype(jnp.float32), jnp.zeros(x.shape, jnp.float32)

    intr_t = jnp.concatenate([cam_params[:, :6], cam_params[:, 9:12]], -1)
    ih, il = hilo(intr_t)
    cam_pack = jnp.stack([ih, il], -1).reshape(C, 18)
    cam_pack = jnp.pad(cam_pack, ((0, 0), (0, 6)))
    R_c = so3_exp(cam_params[:, 6:9])
    rch, rcl = hilo(R_c.reshape(C, 9))
    rc_pack = jnp.concatenate([rch, rcl], -1)  # (C, 18)

    R_p = so3_exp(pose_k[:, :3])
    p_w = jnp.einsum("nj,fij->fni", objpoints, R_p) + pose_k[:, None, 3:]
    pwh, pwl = hilo(p_w)

    def lanes(x):
        x = jnp.repeat(x.transpose(0, 2, 1), 2, axis=-1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, LANES - 2 * N)))

    pw_pack = jnp.concatenate([lanes(pwh), lanes(pwl)], axis=1)

    cost = _ba_chunk_cost(
        cam_pack, rc_pack, pw_pack, obs_hi, obs_lo, msk,
        n_points=N, f_scale=float(f_scale), loss_linear=bool(loss_linear),
        tile_f=Tf, tile_c=int(tile_c), interpret=bool(interpret),
    )
    return cost[:, :F0]
