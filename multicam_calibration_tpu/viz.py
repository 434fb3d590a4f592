"""QC visualization: reprojection residuals, overlays, flatibration plots.

Capability parity with /root/reference/multicam_calibration/viz.py. The
accuracy metric (``plot_residuals`` median error in canonical board units,
viz.py:70-210) is computed with batched device code: the per-frame
cv2.findHomography loop becomes one vmapped DLT over all (camera, frame)
pairs. Plotting stays in matplotlib (host-side, leaf dependency).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .models.bundle_adjustment import embed_calib_objpoints
from .ops.homography import apply_homography, fit_homography
from .ops.precision import with_highest_precision
from .ops.projection import project_points, undistort_points
from .ops.reductions import masked_median

__all__ = [
    "pad_axis_limits",
    "set_axis_limits",
    "compute_residual_metric",
    "plot_residuals",
    "overlay_detections",
    "visualize_flatibration",
    "plot_shared_detections",
    "plot_chessboard_qc_data",
]


def pad_axis_limits(xmin, xmax, ymin, ymax, pad=0.1):
    """Pad x/y limits by a fraction (parity: viz.py:17-40)."""
    x_range = xmax - xmin
    y_range = ymax - ymin
    return (
        xmin - pad * x_range,
        xmax + pad * x_range,
        ymin - pad * y_range,
        ymax + pad * y_range,
    )


def set_axis_limits(ax, data, pctl=1, pad=0.1):
    """Set axis limits from data percentiles (parity: viz.py:43-67)."""
    xmin = np.nanpercentile(data[..., 0], pctl)
    xmax = np.nanpercentile(data[..., 0], 100 - pctl)
    ymin = np.nanpercentile(data[..., 1], pctl)
    ymax = np.nanpercentile(data[..., 1], 100 - pctl)
    xmin, xmax, ymin, ymax = pad_axis_limits(xmin, xmax, ymin, ymax, pad)
    ax.set_xlim(xmin, xmax)
    ax.set_ylim(ymin, ymax)


@jax.jit
@with_highest_precision
def _residual_metric_one_camera(calib_uvs, extrinsics, K, dist, objpoints, pts_world):
    """Batched reprojection-in-board-frame metric for one camera.

    Reproduces the reference metric exactly (viz.py:159-177): reproject the
    consensus board points with a distortion-FREE projection, undistort the
    observed uvs, fit a per-frame homography observed->canonical board, map
    the reprojections through it, and measure distance to the canonical
    points. All frames in one program.
    """
    reproj = project_points(pts_world, extrinsics, K, None)  # (F, N, 2)
    und = undistort_points(calib_uvs, K, dist)  # (F, N, 2)
    valid = jnp.all(jnp.isfinite(und), axis=(-1, -2))  # (F,)
    target = objpoints[:, :2]
    Hs = jax.vmap(lambda uv: fit_homography(uv, target))(jnp.nan_to_num(und))
    transformed = jax.vmap(apply_homography)(Hs, reproj)  # (F, N, 2)
    transformed = jnp.where(valid[:, None, None], transformed, jnp.nan)
    errors = jnp.linalg.norm(transformed - target[None], axis=-1)  # (F, N)
    med = masked_median(
        errors.reshape(-1), jnp.broadcast_to(valid[:, None], errors.shape).reshape(-1),
        axis=0,
    )
    return reproj, transformed, med


def compute_residual_metric(
    all_calib_uvs, all_extrinsics, all_intrinsics, calib_objpoints, calib_poses
):
    """(median_error (C,), reprojections, transformed_reprojections).

    The numeric core of ``plot_residuals`` without the figure — the
    framework's headline accuracy metric (board units, docs: > ~1 indicates
    calibration failure).
    """
    all_calib_uvs = np.asarray(all_calib_uvs)
    n_cameras = all_calib_uvs.shape[0]
    pts_world = embed_calib_objpoints(
        jnp.asarray(calib_objpoints), jnp.asarray(np.nan_to_num(calib_poses))
    )
    objp = jnp.asarray(calib_objpoints)
    median_error = np.zeros(n_cameras)
    reprojections = []
    transformed = []
    for cam in range(n_cameras):
        K, dist = all_intrinsics[cam]
        r, t, m = _residual_metric_one_camera(
            jnp.asarray(all_calib_uvs[cam]),
            jnp.asarray(np.asarray(all_extrinsics[cam], dtype=float)),
            jnp.asarray(np.asarray(K, dtype=float)),
            jnp.asarray(np.asarray(dist, dtype=float)),
            objp,
            pts_world,
        )
        reprojections.append(np.asarray(r))
        transformed.append(np.asarray(t))
        median_error[cam] = float(m)
    return median_error, np.stack(reprojections), np.stack(transformed)


def plot_residuals(
    all_calib_uvs,
    all_extrinsics,
    all_intrinsics,
    calib_objpoints,
    calib_poses,
    max_points=10000,
    marker_size=1,
    target_size=250,
    n_cols=3,
    inches_per_axis=5,
    hide_axes=True,
):
    """Reprojection-error QC figure (parity: viz.py:70-210).

    Returns (fig, median_error (C,), reprojections, transformed_reprojections).
    """
    import matplotlib.pyplot as plt

    all_calib_uvs = np.asarray(all_calib_uvs)
    calib_objpoints = np.asarray(calib_objpoints)
    n_cameras = all_calib_uvs.shape[0]
    median_error, reprojections, transformed_reprojections = (
        compute_residual_metric(
            all_calib_uvs, all_extrinsics, all_intrinsics,
            calib_objpoints, calib_poses,
        )
    )

    n_rows = int(np.ceil(n_cameras / n_cols))
    fig, axes = plt.subplots(n_rows, n_cols, squeeze=False)
    axes = axes.reshape(-1)
    for cam in range(n_cameras):
        pts = transformed_reprojections[cam].reshape(-1, 2)
        plot_ixs = np.nonzero(~np.isnan(pts).any(-1))[0]
        if len(plot_ixs) > max_points:
            plot_ixs = np.random.choice(plot_ixs, max_points, replace=False)
        axes[cam].scatter(
            *calib_objpoints[:, :2].T, c="k", s=target_size, marker="+",
            linewidth=0.5,
        )
        axes[cam].scatter(*pts[plot_ixs].T, c="r", s=marker_size, linewidth=0)
        axes[cam].set_title(
            f"camera {cam} (median error={median_error[cam]:.2f})", fontsize=10
        )
        axes[cam].set_aspect("equal")
        if len(plot_ixs):
            set_axis_limits(axes[cam], pts[plot_ixs], pctl=1, pad=0.1)
        if hide_axes:
            axes[cam].axis("off")
    for i in range(n_cameras, n_rows * n_cols):
        axes[i].axis("off")
    aspect = np.ptp(calib_objpoints[:, 1]) / np.ptp(calib_objpoints[:, 0])
    fig.set_size_inches((n_cols * inches_per_axis, n_rows * inches_per_axis * aspect))
    return fig, median_error, reprojections, transformed_reprojections


# --- dependency-free frame drawing (numpy; no OpenCV required) -------------

_DIGIT_FONT = {  # 3x5 bitmaps, row-major strings
    "0": "111101101101111", "1": "010110010010111", "2": "111001111100111",
    "3": "111001111001111", "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001010010010", "8": "111101111101111",
    "9": "111101111001111",
}


def _draw_disk(frame, u, v, r, color):
    h, w = frame.shape[:2]
    y0, y1 = max(0, v - r), min(h, v + r + 1)
    x0, x1 = max(0, u - r), min(w, u + r + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.ogrid[y0:y1, x0:x1]
    m = (yy - v) ** 2 + (xx - u) ** 2 <= r * r
    frame[y0:y1, x0:x1][m] = color


def _draw_line(frame, p1, p2, color, thickness=2):
    n = int(max(abs(p2[0] - p1[0]), abs(p2[1] - p1[1])) * 2 + 2)
    ts = np.linspace(0.0, 1.0, n)
    pts = np.rint(
        np.outer(1 - ts, np.asarray(p1, float))
        + np.outer(ts, np.asarray(p2, float))
    ).astype(int)
    r = max(1, thickness // 2)
    for u, v in np.unique(pts, axis=0):
        _draw_disk(frame, u, v, r, color)


def _draw_text(frame, text, origin, color, scale=2):
    u0, v0 = origin
    for k, ch in enumerate(str(text)):
        bits = _DIGIT_FONT.get(ch)
        if bits is None:
            continue
        for i in range(5):
            for j in range(3):
                if bits[i * 3 + j] == "1":
                    frame[
                        v0 + i * scale : v0 + (i + 1) * scale,
                        u0 + (k * 4 + j) * scale : u0 + (k * 4 + j + 1) * scale,
                    ] = color


def overlay_detections(
    video_path,
    detections=None,
    output_path=None,
    frame_range=None,
    overwrite=False,
    dotsize=3,
    draw_lines=True,
    frame_label_color=(0, 0, 255),
    frame_label_size=1,
    quality=6,
):
    """Render detections onto a video clip (parity: viz.py:213-328).

    Host-side IO through the framework's own stack: the native C++
    loader/encoder (detection.native_video) when built, cv2/imageio
    otherwise. Drawing is pure numpy — jet-colored dots, connecting lines,
    and a frame-index label, matching the reference's cv2 rendering.
    """
    import os

    import h5py
    import matplotlib.pyplot as plt

    from .detection.video import open_video
    from .detection.native_video import available as _native_ok

    if detections is None:
        detections_path = os.path.splitext(video_path)[0] + ".detections.h5"
        assert os.path.exists(detections_path), (
            f"No detections found at {detections_path}."
        )
        with h5py.File(detections_path, "r") as f:
            uvs = f["uvs"][()]
            frame_ixs = f["frame_ixs"][()]
            detections = {int(t): uvs[i] for i, t in enumerate(frame_ixs)}

    reader = open_video(video_path)
    n_total = len(reader)
    fps = getattr(reader, "fps", 30) or 30

    if frame_range is None:
        start_frame, end_frame = 0, n_total
    else:
        start_frame, end_frame = frame_range
        assert start_frame < end_frame, "start_frame must be less than end_frame."

    if output_path is None:
        base_path = os.path.splitext(video_path)[0]
        output_path = f"{base_path}.overlay-{start_frame}-{end_frame}.mp4"
        print(f"Saving to {output_path}")
    assert (not os.path.exists(output_path)) or overwrite, (
        f'{output_path} already exists. Set "overwrite=True" to overwrite.'
    )

    first = np.asarray(reader[start_frame])
    h, w = first.shape[:2]
    if _native_ok():
        from .detection.native_video import NativeVideoWriter

        writer = NativeVideoWriter(output_path, w, h, fps=fps)
    else:  # pragma: no cover - image lacks native libs
        import imageio

        writer = imageio.get_writer(
            output_path, pixelformat="yuv420p", fps=fps, quality=quality
        )

    label_scale = max(1, int(round(2 * frame_label_size)))
    try:
        for frame_ix in range(start_frame, end_frame):
            try:
                frame = (
                    first
                    if frame_ix == start_frame
                    else np.asarray(reader[frame_ix])
                )
            except IndexError:
                # Containers routinely over-report frame counts; finish with
                # the frames that exist (reference detection.py behavior).
                break
            if frame.ndim == 2:
                frame = np.repeat(frame[:, :, None], 3, axis=2)
            frame = np.ascontiguousarray(frame, np.uint8)
            if frame_ix in detections:
                uvs = detections[frame_ix]
                all_colors = plt.cm.jet(np.linspace(0, 1, len(uvs)))[:, :3] * 255
                # Keep each point's jet color tied to its corner index even
                # when some corners are NaN.
                positions, colors = [], []
                for (u, v), c in zip(uvs, all_colors):
                    if np.isfinite(u) and np.isfinite(v):
                        positions.append((int(u), int(v)))
                        colors.append((int(c[0]), int(c[1]), int(c[2])))
                if draw_lines:
                    for p1, p2, color in zip(positions[:-1], positions[1:], colors):
                        _draw_line(frame, p1, p2, color, 2)
                for (u, v), color in zip(positions, colors):
                    _draw_disk(frame, u, v, dotsize, color)
            _draw_text(
                frame, frame_ix, (20, h - 20 - 5 * label_scale),
                frame_label_color, label_scale,
            )
            writer.append_data(frame)
    finally:
        writer.close()
        if hasattr(reader, "close"):
            reader.close()
    return output_path


def visualize_flatibration(
    transform,
    floor_points,
    keypoints=None,
    max_points_to_plot=5000,
    figsize=(12, 6),
    axis_limits_pad=0.1,
    axis_limits_pctl=1,
):
    """2x2 before/after scatter of floor points (parity: viz.py:331-435)."""
    import matplotlib.pyplot as plt

    from .ops.transforms import apply_rigid_transform

    fig, axs = plt.subplots(2, 2, figsize=figsize)
    if isinstance(floor_points, list):
        floor_points = np.concatenate(floor_points)
    floor_points = np.asarray(floor_points, dtype=float)
    if len(floor_points) > max_points_to_plot:
        ix = np.random.choice(len(floor_points), max_points_to_plot, replace=False)
        floor_points = floor_points[ix]

    set_lims = partial(set_axis_limits, pctl=axis_limits_pctl, pad=axis_limits_pad)

    axs[0, 0].scatter(*floor_points[:, [0, 2]].T, s=1, label="floor points", zorder=1)
    set_lims(axs[0, 0], floor_points[:, [0, 2]])
    axs[1, 0].scatter(*floor_points[:, [1, 2]].T, s=1, label="floor points", zorder=1)
    set_lims(axs[1, 0], floor_points[:, [1, 2]])

    fp_t = np.asarray(
        jax.device_get(
            apply_rigid_transform(jnp.asarray(transform), jnp.asarray(floor_points))
        )
    )
    axs[0, 1].scatter(*fp_t[:, [0, 2]].T, s=1, label="floor points", zorder=1)
    set_lims(axs[0, 1], fp_t[:, [0, 2]])
    axs[1, 1].scatter(*fp_t[:, [1, 2]].T, s=1, label="floor points", zorder=1)
    set_lims(axs[1, 1], fp_t[:, [1, 2]])

    if keypoints is not None:
        if isinstance(keypoints, list):
            keypoints = np.concatenate(keypoints)
        keypoints = np.asarray(keypoints, dtype=float).reshape(-1, 3)
        if len(keypoints) > max_points_to_plot:
            ix = np.random.choice(len(keypoints), max_points_to_plot, replace=False)
            keypoints = keypoints[ix]
        axs[0, 0].scatter(*keypoints[:, [0, 2]].T, s=1, label="keypoints", zorder=0)
        set_lims(axs[0, 0], keypoints[:, [0, 2]])
        axs[1, 0].scatter(*keypoints[:, [1, 2]].T, s=1, label="keypoints", zorder=0)
        set_lims(axs[1, 0], keypoints[:, [1, 2]])
        kp_t = np.asarray(
            jax.device_get(
                apply_rigid_transform(jnp.asarray(transform), jnp.asarray(keypoints))
            )
        )
        axs[0, 1].scatter(*kp_t[:, [0, 2]].T, s=1, label="keypoints", zorder=0)
        set_lims(axs[0, 1], kp_t[:, [0, 2]])
        axs[1, 1].scatter(*kp_t[:, [1, 2]].T, s=1, label="keypoints", zorder=0)
        set_lims(axs[1, 1], kp_t[:, [1, 2]])

    for ax in axs[:, 0]:
        ax.set_title("untransformed")
    for ax in axs[:, 1]:
        ax.set_title("transformed")
    for ax in axs[0]:
        ax.set_xlabel("x")
    for ax in axs[1]:
        ax.set_xlabel("y")
    for ax in axs.flat:
        ax.set_ylabel("z")
        ax.axhline(0, color="k", lw=1, zorder=2)
    plt.tight_layout()
    return fig


def plot_shared_detections(all_calib_uvs, spanning_tree, figsize=(9, 2)):
    """Heatmap of shared detections per spanning-tree edge (viz.py:438-487)."""
    import matplotlib.pyplot as plt

    all_calib_uvs = np.asarray(all_calib_uvs)
    shared_detections = np.array(
        [
            np.all(~np.isnan(all_calib_uvs[[c1, c2]]).any((-1, -2)), axis=0)
            for c1, c2 in spanning_tree
        ]
    )
    fig, ax = plt.subplots(1, 1, figsize=figsize)
    ax.imshow(
        shared_detections, aspect="auto", cmap="binary", origin="lower",
        interpolation="none",
    )
    ax.set_xlabel("frame")
    ax.set_title("Shared detections")
    ax.set_yticks(np.arange(len(spanning_tree)))
    ax.set_yticklabels([f"(camera {c1}, camera {c2})" for c1, c2 in spanning_tree])
    plt.tight_layout()
    return fig, shared_detections


def plot_chessboard_qc_data(video_paths, figsize=(12, 6)):
    """Anchor-match score QC figure (reference detection.py:521-583).

    Top row: per-frame heatmap of the four sorted anchor-match scores read
    from each video's ``{video}.detections.h5`` cache. Bottom row: best vs
    second-best scatter with diagonal guide lines at 0.1 offsets — the gap
    between the two is what ``match_score_min_diff`` thresholds in
    :func:`detect_chessboard`.
    """
    import os

    import h5py
    import matplotlib.pyplot as plt

    qc_datas = []
    for video_path in video_paths:
        detections_path = os.path.splitext(video_path)[0] + ".detections.h5"
        if not os.path.exists(detections_path):
            raise FileNotFoundError(
                f"Could not find {detections_path}. "
                "Run `run_calibration_detection` first."
            )
        with h5py.File(detections_path, "r") as h5:
            if "qc_data" not in h5:
                raise KeyError(
                    f"{detections_path} has no qc_data dataset — rerun "
                    "detection with reorder=True"
                )
            qc_datas.append(h5["qc_data"][:])

    fig, axs = plt.subplots(
        3,
        len(qc_datas),
        figsize=figsize,
        gridspec_kw={"height_ratios": [1, 0.05, 0.4]},
        squeeze=False,
    )
    for i, qc_data in enumerate(qc_datas):
        cax = axs[0, i].imshow(qc_data, aspect="auto", interpolation="nearest")
        axs[0, i].set_ylabel("Frame")
        axs[0, i].set_xlabel("match score")
        axs[0, i].set_title(os.path.basename(video_paths[i]), fontsize=10)
        plt.colorbar(cax, cax=axs[1, i], orientation="horizontal")

        axs[2, i].scatter(qc_data[:, 0], qc_data[:, 1], s=1, linewidth=0)
        axs[2, i].set_xlabel("best")
        axs[2, i].set_ylabel("second-best")
        axs[2, i].set_aspect("equal")
        axs[2, i].axline((0, 0), slope=1, c="k")
        axs[2, i].set_xlim([0, 1])
        axs[2, i].set_ylim([0, 1])
        for offset in np.arange(0.1, 1, 0.1):
            axs[2, i].axline((offset, 0), slope=1, c="k", ls="--", lw=0.5)
    plt.tight_layout()
    return fig
