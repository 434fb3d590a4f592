"""Rolling re-calibration: windowed BA over a stream of frame batches.

BASELINE.json config 4 ("Rolling re-calibration stream: windowed BA over
incoming frame batches (online keyframe partitioning)") — a capability the
reference lacks entirely (its answer to drift is a full offline re-run).

TPU-shaped design: the keyframe window has a FIXED capacity, so every
update executes the same compiled LM program (static shapes, zero
recompilation in steady state). Each `update(batch_uvs)`:

1. initializes the new frames' board poses by batched planar PnP against
   the *current* camera estimates (+ consensus across cameras),
2. admits them to the window, evicting the lowest-value keyframes — value
   = sum over camera pairs of 1/pair_coverage, i.e. frames that are the
   rare witnesses of a camera pair are protected (recent frames are always
   protected to track drift),
3. runs a few warm-started LM iterations on the window (damping state
   carried across updates via ``init_lam``) and re-estimates the cameras.

The result is a calibration that tracks slow rig drift at a per-batch cost
of O(window) instead of O(history).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import jax

from .bundle_adjustment import _arrays_to_params, _params_to_arrays
from .initialize import _estimate_pose_impl, consensus_calib_poses
from .lm_core import LMOptions, lm_solve

# Pose init for all cameras in ONE dispatch: vmap _estimate_pose_impl over
# the camera axis (per-camera intrinsics stacked). The per-camera Python
# loop cost C separate device dispatches per update — 64 round trips per
# update on a remote TPU backend.
_batched_estimate_pose = jax.jit(
    jax.vmap(_estimate_pose_impl, in_axes=(0, 0, 0, None))
)

__all__ = ["RollingCalibrator"]


class RollingCalibrator:
    def __init__(
        self,
        all_extrinsics,
        all_intrinsics,
        calib_objpoints,
        window=256,
        iters_per_update=3,
        protect_recent=32,
        refine_intrinsics=False,
        dtype=None,
        lm_options=None,
    ):
        # refine_intrinsics=False by default: rig drift is geometric (mounts
        # flex, lenses don't), and with a small window free intrinsics trade
        # off against depth (fx <-> z ambiguity) — observed ~20-40 mm
        # relative-extrinsics drift at healthy reprojection cost when all 12
        # camera params float on a 64-frame window.
        self._ext = np.asarray(all_extrinsics, np.float64)
        self._intr = [
            (np.asarray(K, np.float64), np.asarray(d, np.float64))
            for K, d in all_intrinsics
        ]
        self.objpoints = np.asarray(calib_objpoints, np.float64)
        self.window = int(window)
        self.protect_recent = int(protect_recent)
        n_cameras = self._ext.shape[0]
        N = self.objpoints.shape[0]
        self._dtype = dtype or jnp.zeros(0).dtype
        # Same platform-aware numerics as bundle_adjust: under f64 data on
        # an accelerator backend, run Jacobians / J^T J blocks / Schur /
        # cost projections in f32 (only the residual-gradient path needs
        # f64; TPU emulates f64 at ~10-20x f32 cost, and the pure-f64
        # 64-cam x window-256 program is heavy enough to stress the
        # compiler).
        f32_extras = {}
        if self._dtype == jnp.float64 and (
            jnp.zeros(0).devices().pop().platform != "cpu"
        ):
            f32_extras = dict(
                jac_dtype="float32",
                block_dtype="float32",
                cost_dtype="float32",
                solve_dtype="float32",
                # Per-obs weighting/gradient products in f32 (residual
                # still formed f64): the block build dominates each
                # fixed-iteration update.
                grad_dtype="float32",
                lambda_escalation=3.0,
            )
        self._opts = lm_options or LMOptions(
            max_iters=int(iters_per_update), ftol=0.0, **f32_extras
        )
        cam_free = np.ones((n_cameras, 12), np.float32)
        if not refine_intrinsics:
            cam_free[:, :6] = 0.0
        self._cam_free = cam_free
        # Window state (host): observations, masks, poses, ages.
        self._obs = np.full((n_cameras, self.window, N, 2), np.nan)
        self._poses = np.zeros((self.window, 6))
        self._order = np.full(self.window, -1, dtype=np.int64)  # arrival idx
        self._next_arrival = 0
        self._lam = None
        self.n_updates = 0

    # -- public state ------------------------------------------------------
    @property
    def n_cameras(self):
        return self._ext.shape[0]

    def calibration(self):
        """Current (all_extrinsics, all_intrinsics)."""
        return self._ext.copy(), [(K.copy(), d.copy()) for K, d in self._intr]

    @property
    def occupancy(self):
        return int((self._order >= 0).sum())

    # -- internals -----------------------------------------------------------
    def _frame_values(self):
        """Keyframe value: rare camera-pair witnesses are precious.

        Vectorized over all C*(C-1)/2 pairs at once (the per-pair Python
        loop was O(C^2) interpreter iterations per update — 2016 at 64
        cameras); peak temp is the (P, W) co-visibility table, ~0.5 MB at
        64 cams x window 256.
        """
        seen = ~np.isnan(self._obs).any((-1, -2))  # (C, W)
        so = seen & (self._order >= 0)[None, :]
        a, b = np.triu_indices(so.shape[0], k=1)
        co = so[a] & so[b]  # (P, W)
        counts = co.sum(1)
        nz = counts > 0
        if not nz.any():
            return np.zeros(self.window)
        return (co[nz] / counts[nz, None]).sum(0)

    def _evict_slots(self, n_needed):
        """Pick distinct slots for new frames: empty first, then the
        lowest-value unprotected keyframes, then (only if the batch exceeds
        window - protect_recent) the oldest protected ones."""
        empty = np.nonzero(self._order < 0)[0]
        if len(empty) >= n_needed:
            return empty[:n_needed]
        slots = list(empty)
        n_more = n_needed - len(empty)
        occupied_ix = np.nonzero(self._order >= 0)[0]
        recency = np.argsort(self._order[occupied_ix])[::-1]
        protected = set(occupied_ix[recency[: self.protect_recent]].tolist())
        value = self._frame_values()
        evictable = np.asarray(
            [s for s in occupied_ix if s not in protected], dtype=np.int64
        )
        if len(evictable):
            order = evictable[np.argsort(value[evictable])]
            slots.extend(order[:n_more].tolist())
            n_more = n_needed - len(slots)
        if n_more > 0:  # huge batch: give up the oldest protected frames
            by_age = occupied_ix[np.argsort(self._order[occupied_ix])]
            remaining = [s for s in by_age.tolist() if s not in slots]
            slots.extend(remaining[:n_more])
        return np.asarray(slots[:n_needed], dtype=np.int64)

    def update(self, batch_uvs):
        """Ingest (n_cameras, B, N, 2) detections (NaN = unseen); refine.

        Returns an info dict (cost, n_iters, window occupancy).
        """
        batch_uvs = np.asarray(batch_uvs, np.float64)
        C, B = batch_uvs.shape[:2]
        if C != self.n_cameras:
            raise ValueError(f"expected {self.n_cameras} cameras, got {C}")

        # 1. pose init for the incoming frames at current cameras (one
        # batched vmapped call across all cameras — the per-camera Python
        # loop cost C separate dispatches). Pinned to the CPU backend: the
        # data is tiny (C x B x N x 2), the homography-pose path contains
        # 3x3 LU solves that XLA:TPU does not implement for emulated f64,
        # and the accelerator's time belongs to the windowed LM below.
        Ks = np.stack([K for K, _ in self._intr])
        ds = np.stack([d for _, d in self._intr])
        with jax.default_device(jax.devices("cpu")[0]):
            per_cam = np.asarray(
                _batched_estimate_pose(
                    jnp.asarray(batch_uvs), jnp.asarray(Ks), jnp.asarray(ds),
                    jnp.asarray(self.objpoints),
                )
            )
        poses_new = np.asarray(consensus_calib_poses(per_cam, self._ext))
        ok = ~np.isnan(poses_new).any(-1)

        # 2. admit to the window (a batch larger than the window keeps its
        # newest `window` frames).
        new_ix = np.nonzero(ok)[0]
        if len(new_ix) > self.window:
            new_ix = new_ix[-self.window :]
        slots = self._evict_slots(len(new_ix))
        for slot, j in zip(slots, new_ix):
            self._obs[:, slot] = batch_uvs[:, j]
            self._poses[slot] = poses_new[j]
            self._order[slot] = self._next_arrival
            self._next_arrival += 1

        # 3. windowed LM (static shapes; same compiled program every call).
        occupied = self._order >= 0
        seen_count = (~np.isnan(self._obs).any((-1, -2))).sum(0)
        active = occupied & (seen_count >= 2)
        mask_np = (
            ~np.isnan(self._obs).any(-1) & active[None, :, None]
        )  # (C, W, N)
        dt = self._dtype
        cam0 = jnp.asarray(_params_to_arrays(self._ext, self._intr), dt)
        obs = jnp.asarray(np.nan_to_num(self._obs), dt)
        mask = jnp.asarray(mask_np)
        poses0 = jnp.asarray(np.nan_to_num(self._poses), dt)
        objp = jnp.asarray(self.objpoints, dt)
        cam, poses, info = lm_solve(
            cam0, poses0, obs, mask, objp, self._opts,
            cam_free=jnp.asarray(self._cam_free, dt), init_lam=self._lam,
        )
        self._lam = float(info["lambda"])
        # np.array (copy): np.asarray of a jax array is a read-only view,
        # and the window buffers are mutated by later updates.
        self._ext, self._intr = _arrays_to_params(np.array(cam, np.float64))
        self._poses = np.array(poses, np.float64)
        self.n_updates += 1
        return {
            "cost": float(info["final_cost"]),
            "n_iters": int(info["n_iters"]),
            "occupancy": self.occupancy,
            "admitted": int(len(new_ix)),
        }
