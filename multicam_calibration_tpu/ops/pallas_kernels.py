"""Pallas TPU kernels for the detection hot path.

The per-pixel corner-response stage is where detection FLOPs/bandwidth live
(it touches every pixel of every frame of every camera; the reference spends
this inside cv2.findChessboardCorners, detection.py:384). The XLA fallback
(`detection.detector.corner_response`) lowers to five separate
`conv_general_dilated` calls — five HBM round-trips over the smoothed image.
This kernel fuses grayscale smoothing and the saddle response into ONE pass:
each (TILE_H x W) row-band is DMA'd HBM->VMEM once (with halo), the 11-tap
separable Gaussian and the three Hessian stencils run on the VPU entirely in
VMEM, and only the response tile is written back — ~7x less HBM traffic.

Semantics match `corner_response` (zero-padded SAME convolutions) everywhere
except a 1-pixel border: the fused kernel smooths *through* the halo instead
of re-zeroing the smoothed image before the derivative stencils, which is
strictly more accurate. Detection masks an >= 8-pixel border before NMS
(detector.find_corner_candidates), so results are identical in practice.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corner_response_pallas", "corner_response_peaks_pallas", "on_tpu"]


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU."""
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - no backend at all
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _response_kernel(kvec, halo, tile_h, copy_h, x_hbm, out_ref, scratch, sem):
    """One row-band: DMA (copy_h, Wp) into VMEM, fused stencil.

    kvec: (2r+1,) python-level numpy Gaussian taps (baked into the program).
    copy_h is tile_h + 2*halo rounded up to the 8-sublane tiling (Mosaic
    requires aligned VMEM slice heights); the surplus rows are dead padding.
    Derivative stencils (radius 1) follow the reference exactly:
    Ixx = [1,-2,1] along x, Iyy along y, Ixy = 0.25 * diagonal cross
    (detection/detector.py:corner_response).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, copy_h), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    x = scratch[: tile_h + 2 * halo]  # (tile_h + 2*halo, Wp)
    r = halo - 1  # Gaussian radius
    wp = x.shape[1]
    wg = wp - 2 * r  # width after horizontal Gaussian

    # Separable Gaussian as shifted multiply-adds (valid conv, VPU).
    g1 = kvec[0] * x[:, 0:wg]
    for t in range(1, 2 * r + 1):
        g1 = g1 + kvec[t] * x[:, t : t + wg]
    hg = tile_h + 2  # rows after vertical Gaussian (= tile_h + 2*1 deriv halo)
    g2 = kvec[0] * g1[0:hg, :]
    for t in range(1, 2 * r + 1):
        g2 = g2 + kvec[t] * g1[t : t + hg, :]

    # Hessian stencils (valid, radius 1).
    ixx = g2[1:-1, 0:-2] - 2.0 * g2[1:-1, 1:-1] + g2[1:-1, 2:]
    iyy = g2[0:-2, 1:-1] - 2.0 * g2[1:-1, 1:-1] + g2[2:, 1:-1]
    ixy = 0.25 * (g2[0:-2, 0:-2] + g2[2:, 2:] - g2[0:-2, 2:] - g2[2:, 0:-2])

    out_ref[0] = ixy * ixy - ixx * iyy


@functools.partial(jax.jit, static_argnames=("sigma", "tile_h", "interpret"))
def _corner_response_pallas(gray, sigma=1.5, tile_h=128, interpret=False):
    # f32 kernel: the stencil runs on the VPU in f32 (image data has 8-bit
    # provenance); f64 grays (callers under jax_enable_x64) are downcast —
    # the x64-off context below would otherwise store f32 into an f64 ref.
    if gray.dtype == jnp.float64:
        gray = gray.astype(jnp.float32)
    B, H, W = gray.shape
    dtype = gray.dtype
    r = int(3 * sigma + 0.5)
    halo = r + 1

    hp = _round_up(H, tile_h)
    copy_h = _round_up(tile_h + 2 * halo, 8)
    # Lane-dim padding: W + 2*halo rounded to the 128-lane register width.
    wp = _round_up(W + 2 * halo, 128)
    wo = wp - 2 * halo

    x = jnp.zeros((B, hp + (copy_h - tile_h), wp), dtype)
    x = jax.lax.dynamic_update_slice(x, gray, (0, halo, halo))

    kvec = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    # Python floats (weak-typed), NOT np.float64 scalars: under
    # jax_enable_x64 an np scalar tap promotes the whole f32 chain to f64
    # and the kernel's f32 out_ref store fails at trace time.
    kvec = [float(v) for v in kvec / kvec.sum()]

    grid = (B, hp // tile_h)
    # x64 OFF around the pallas_call: under jax_enable_x64 the grid index
    # maps trace as int64, which Mosaic cannot legalize ('func.return
    # (i32, i32, i64) failed to legalize' — caught by tpu_parity's
    # detection battery on hardware; same guard as ops/ba_pallas.py).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_response_kernel, kvec, halo, tile_h, copy_h),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, tile_h, wo),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, hp, wo), dtype),
            scratch_shapes=[
                pltpu.VMEM((copy_h, wp), dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(x)
    return out[:, :H, :W]


def _response_peaks_kernel(
    kvec, rg, nms, tile_h, copy_h, x_hbm, resp_ref, peak_ref, scratch, sem
):
    """Fused response + (2*nms+1)^2 local-max peak mask, one HBM pass.

    Extends _response_kernel: the response is computed over an nms-halo-
    extended band so the NMS local max (the XLA path's reduce_window) comes
    from shifted jnp.maximum right in VMEM. Peak semantics match
    detector.find_corner_candidates: resp >= window max AND resp > 0
    (border rows/cols differ vs reduce_window's -inf padding but sit inside
    the margin the caller masks off).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    halo = rg + 1 + nms

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_h, copy_h), :], scratch, sem
    )
    copy.start()
    copy.wait()

    x = scratch[: tile_h + 2 * halo]
    wp = x.shape[1]
    wg = wp - 2 * rg

    g1 = kvec[0] * x[:, 0:wg]
    for t in range(1, 2 * rg + 1):
        g1 = g1 + kvec[t] * x[:, t : t + wg]
    hg = tile_h + 2 * (nms + 1)
    g2 = kvec[0] * g1[0:hg, :]
    for t in range(1, 2 * rg + 1):
        g2 = g2 + kvec[t] * g1[t : t + hg, :]

    ixx = g2[1:-1, 0:-2] - 2.0 * g2[1:-1, 1:-1] + g2[1:-1, 2:]
    iyy = g2[0:-2, 1:-1] - 2.0 * g2[1:-1, 1:-1] + g2[2:, 1:-1]
    ixy = 0.25 * (g2[0:-2, 0:-2] + g2[2:, 2:] - g2[0:-2, 2:] - g2[2:, 0:-2])
    resp_ext = ixy * ixy - ixx * iyy  # (tile_h + 2*nms, wg - 2)

    # Separable (2n+1)^2 window max: rows of column-maxes — 4n+2 shifted
    # maximum ops instead of (2n+1)^2, and a short VMEM live range (the
    # naive double loop ran the compiler out of scoped vmem).
    wo = resp_ext.shape[1] - 2 * nms
    mx = resp_ext[:, 0:wo]
    for dx in range(1, 2 * nms + 1):
        mx = jnp.maximum(mx, resp_ext[:, dx : dx + wo])
    m = mx[0:tile_h]
    for dy in range(1, 2 * nms + 1):
        m = jnp.maximum(m, mx[dy : dy + tile_h])
    center = resp_ext[nms : nms + tile_h, nms : nms + wo]
    resp_ref[0] = center
    peak_ref[0] = ((center >= m) & (center > 0)).astype(center.dtype)


@functools.partial(
    jax.jit, static_argnames=("sigma", "nms_radius", "tile_h", "interpret")
)
def _corner_response_peaks_pallas(
    gray, sigma=1.5, nms_radius=4, tile_h=64, interpret=False
):
    # f32 kernel: see _corner_response_pallas.
    if gray.dtype == jnp.float64:
        gray = gray.astype(jnp.float32)
    B, H, W = gray.shape
    dtype = gray.dtype
    rg = int(3 * sigma + 0.5)
    halo = rg + 1 + int(nms_radius)

    hp = _round_up(H, tile_h)
    copy_h = _round_up(tile_h + 2 * halo, 8)
    wp = _round_up(W + 2 * halo, 128)
    wo = wp - 2 * halo

    # VMEM-stack guard (compiled-only failure class): when the custom
    # call's FULL outputs fit under XLA:TPU's 16 MB scoped-vmem limit,
    # layout assignment places them in VMEM (S(1)); at large halos (the
    # sigma=9 blur rung: outputs 2 x 4x512x704 f32 = 11.5 MB) the outputs
    # plus the staged input block overflow the window and compilation
    # fails with a kernel-vmem-stack OOM. Interpret-mode tests cannot see
    # this. Slab the batch so each call stays ~<= 6 MB of outputs —
    # either the slabs are placed in VMEM with headroom or they spill to
    # HBM; both compile. (Huge batches, e.g. 128 full frames, never fit
    # and always go to HBM — only the mid-size window is affected.)
    itemsize = jnp.dtype(dtype).itemsize
    out_el = 2 * hp * wo  # both outputs, per frame
    in_el = (hp + copy_h - tile_h) * wp  # staged input, per frame
    # Scoped-stack model CALIBRATED against the compiler's own accounting
    # (r5 hardware battery: B=2 sigma=9 480x640 f32 measured 19.96 MB vs
    # the 16 MB limit): the custom call's stack is ~2x(outputs + staged
    # input) + scratch — outputs appear once as kernel outputs and once
    # as relayout copies, the input as operand + copy. The r4 model
    # (1x outputs + input) under-counted and shipped slabs that still
    # overflowed at large halos.
    stack_per_frame = 2 * (out_el + in_el) * itemsize
    fixed = copy_h * wp * itemsize
    out_total = B * out_el * itemsize
    stack_total = B * stack_per_frame + fixed
    # Danger window: outputs alone fit (so XLA may place them in VMEM)
    # but the modeled stack overflows the 16 MB scoped window.
    max_b = max(1, ((12 << 20) - fixed) // stack_per_frame)
    if B > max_b and out_total < (16 << 20) and stack_total > (12 << 20):
        nb = -(-B // max_b)
        pad_b = nb * max_b - B
        gpad = jnp.pad(gray, ((0, pad_b), (0, 0), (0, 0)))
        slabs = gpad.reshape(nb, max_b, H, W)
        resp, peak = jax.lax.map(
            lambda g: _corner_response_peaks_pallas(
                g, sigma=sigma, nms_radius=nms_radius, tile_h=tile_h,
                interpret=interpret,
            ),
            slabs,
        )
        resp = resp.reshape(nb * max_b, H, W)[:B]
        peak = peak.reshape(nb * max_b, H, W)[:B]
        return resp, peak

    x = jnp.zeros((B, hp + (copy_h - tile_h), wp), dtype)
    x = jax.lax.dynamic_update_slice(x, gray, (0, halo, halo))

    kvec = np.exp(-0.5 * (np.arange(-rg, rg + 1) / sigma) ** 2)
    # Python floats, not np.float64 scalars (see _corner_response_pallas).
    kvec = [float(v) for v in kvec / kvec.sum()]

    grid = (B, hp // tile_h)
    out_spec = pl.BlockSpec(
        (1, tile_h, wo), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    # x64 OFF: see _corner_response_pallas (i64 grid index maps fail
    # Mosaic legalization; caught on hardware by tpu_parity).
    with jax.enable_x64(False):
        resp, peak = pl.pallas_call(
            functools.partial(
                _response_peaks_kernel, list(kvec), rg, int(nms_radius),
                tile_h, copy_h,
            ),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, hp, wo), dtype),
                jax.ShapeDtypeStruct((B, hp, wo), dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((copy_h, wp), dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(x)
    return resp[:, :H, :W], peak[:, :H, :W] > 0


def corner_response_peaks_pallas(
    gray, sigma=1.5, nms_radius=4, tile_h=64, interpret=None
):
    """Fused (response, is_peak) over (B, H, W) — one HBM pass instead of
    response + reduce_window + compare. See corner_response_pallas.

    Large sigmas (>= ~6): the kernel's internal VMEM frame grows with the
    unrolled Gaussian tap count (~20 MB at sigma=9/rg=27 — measured by
    the r5 hardware battery) and exceeds XLA:TPU's default 16 MB scoped
    window REGARDLESS of batch size. Callers jitting those sigmas must
    raise the per-executable budget via
    ``compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"}`` on a
    TPU backend, as the production blur ladder does
    (detection.detector._coarse_retry_jit)."""
    if interpret is None:
        interpret = not on_tpu()
    return _corner_response_peaks_pallas(
        gray, sigma=sigma, nms_radius=nms_radius, tile_h=tile_h,
        interpret=bool(interpret),
    )


def corner_response_pallas(gray, sigma=1.5, tile_h=128, interpret=None):
    """Fused saddle-point corner response Ixy^2 - Ixx*Iyy over (B, H, W).

    Drop-in for `detection.detector.corner_response` (same stencils; see
    module docstring for the 1-pixel border caveat). `interpret=None` picks
    compiled mode on TPU and the Pallas interpreter elsewhere, so the same
    call works in CPU test meshes and on hardware.
    """
    if interpret is None:
        interpret = not on_tpu()
    return _corner_response_pallas(
        gray, sigma=sigma, tile_h=tile_h, interpret=bool(interpret)
    )
