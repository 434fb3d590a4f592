"""Multi-host input pipeline: per-host video decode + shard placement.

SURVEY.md §7 hard part 5: "per-host video decode and shard placement with
deterministic frame-to-device mapping". Design: each host decodes and
detects only its assigned videos (the native loader is per-host local IO),
detection results are exchanged once via process allgather (tiny: corner
arrays, not frames), and BA inputs are placed with a NamedSharding over the
'frames' mesh axis so XLA moves each frame block to its owner exactly once.

Single-host (n_processes == 1) everything degenerates to the local path —
which is how the tests exercise the full code path on the virtual mesh.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = [
    "assign_videos_to_host",
    "gather_detections",
    "shard_ba_inputs",
    "distributed_calibration_detection",
]


def assign_videos_to_host(video_paths, process_index=None, process_count=None):
    """Deterministic round-robin split of videos across hosts.

    Returns (my_paths, my_camera_indices). Every host computes the same
    global assignment, so camera ordering is stable without communication.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    mine = [(i, p) for i, p in enumerate(video_paths) if i % pc == pi]
    return [p for _, p in mine], [i for i, _ in mine]


def gather_detections(local_uvs, camera_indices, n_cameras, n_frames, n_points):
    """Assemble the global (n_cameras, n_frames, N, 2) detection array from
    per-host results.

    ``local_uvs``: (len(camera_indices), n_frames, N, 2) detections for this
    host's cameras. Cross-host exchange uses multihost_utils allgather when
    more than one process is present (payload = corners only, ~bytes/frame).
    """
    out = np.full((n_cameras, n_frames, n_points, 2), np.nan)
    for row, cam in enumerate(camera_indices):
        out[cam] = local_uvs[row]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Sum-reduce the NaN-disjoint per-host arrays: replace NaN with 0,
        # track coverage masks so untouched slots return to NaN.
        filled = np.nan_to_num(out)
        cover = (~np.isnan(out)).astype(np.float32)
        filled = np.asarray(
            multihost_utils.process_allgather(filled, tiled=False)
        ).sum(0)
        cover = np.asarray(
            multihost_utils.process_allgather(cover, tiled=False)
        ).sum(0)
        out = np.where(cover > 0, filled / np.maximum(cover, 1), np.nan)
    return out


def shard_ba_inputs(obs, mask, poses, mesh, axis_name="frames"):
    """Place BA inputs with frame-axis sharding over ``mesh``.

    obs (C, F, N, 2) and mask (C, F, N) shard along F (axis 1); poses (F, 6)
    along F (axis 0). Frames are zero/False-padded to a multiple of the mesh
    size — padded frames carry all-False masks so they are exactly inert in
    the solver (identity-padded pose blocks, zero updates).

    Returns (obs, mask, poses, n_frames_original).
    """
    n_dev = mesh.shape[axis_name]
    F = poses.shape[0]
    pad = (-F) % n_dev
    obs = np.asarray(obs)
    mask = np.asarray(mask)
    poses = np.asarray(poses)
    if pad:
        obs = np.concatenate(
            [obs, np.zeros((obs.shape[0], pad, *obs.shape[2:]), obs.dtype)], 1
        )
        mask = np.concatenate(
            [mask, np.zeros((mask.shape[0], pad, *mask.shape[2:]), bool)], 1
        )
        poses = np.concatenate([poses, np.zeros((pad, 6), poses.dtype)])
    obs_s = jax.device_put(obs, NamedSharding(mesh, P(None, axis_name)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, axis_name)))
    poses_s = jax.device_put(poses, NamedSharding(mesh, P(axis_name)))
    return obs_s, mask_s, poses_s, F


def distributed_calibration_detection(
    video_paths, detection_fun=None, detection_options=None, **kwargs
):
    """Multi-host run_calibration_detection: each host detects its videos.

    Single-process: identical to run_calibration_detection. Multi-process:
    each host runs the SAME single-host pipeline on its assigned videos
    (local decode + local device, all of run_calibration_detection's cache/
    overwrite/alignment semantics), then one corner allgather + img-size
    exchange assembles the global arrays. Returns (all_calib_uvs,
    img_sizes) on every host.
    """
    from ..detection.video import run_calibration_detection
    from ..detection.detector import detect_chessboard

    detection_fun = detection_fun or detect_chessboard
    if jax.process_count() == 1:
        return run_calibration_detection(
            video_paths, detection_fun, detection_options, **kwargs
        )

    from jax.experimental import multihost_utils

    if jax.process_count() > len(video_paths):
        raise ValueError(
            f"{jax.process_count()} processes for {len(video_paths)} videos: "
            "every host must own at least one video"
        )
    my_paths, my_cams = assign_videos_to_host(video_paths)
    # Camera-indexed kwargs must be sliced to this host's camera subset —
    # run_calibration_detection consumes them positionally (e.g.
    # aligned_frame_ixs[:, i] / all_frames[i] for LOCAL camera i), so
    # forwarding the global arrays would silently apply column i to global
    # camera my_cams[i].
    kwargs = dict(kwargs)
    if kwargs.get("aligned_frame_ixs") is not None:
        kwargs["aligned_frame_ixs"] = np.asarray(kwargs["aligned_frame_ixs"])[
            :, my_cams
        ]
    if kwargs.get("all_frames") is not None:
        all_frames = kwargs["all_frames"]
        kwargs["all_frames"] = [all_frames[c] for c in my_cams]
    uvs_local, sizes_local = run_calibration_detection(
        my_paths, detection_fun, detection_options, **kwargs
    )
    # Agree on the global frame count (containers may differ across hosts).
    n_frames = int(
        np.min(multihost_utils.process_allgather(np.array(uvs_local.shape[1])))
    )
    uvs_local = uvs_local[:, :n_frames]
    n_points = uvs_local.shape[2]
    uvs = gather_detections(
        uvs_local, my_cams, len(video_paths), n_frames, n_points
    )
    # Exchange image sizes (-1 padding + elementwise max across hosts).
    sizes = np.full((len(video_paths), 2), -1, np.int64)
    for row, cam in enumerate(my_cams):
        sizes[cam] = sizes_local[row]
    sizes = np.asarray(multihost_utils.process_allgather(sizes)).max(0)
    return uvs, [tuple(int(v) for v in s) for s in sizes]