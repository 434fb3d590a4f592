"""Distribution layer: device meshes + frame-sharded bundle adjustment.

The scaling dimension of calibration is the frame axis (SURVEY.md §5): pose
blocks shard across devices, camera blocks replicate, and the only per-LM-
iteration communication is a psum of the reduced (12C)^2 camera system +
scalar cost — a few MB over ICI even at 64 cameras.
"""
from .mesh import make_frame_mesh
from .sharded import sharded_lm_solve, sharded_triangulate
from .input_pipeline import (
    assign_videos_to_host,
    distributed_calibration_detection,
    gather_detections,
    shard_ba_inputs,
)

__all__ = [
    "make_frame_mesh",
    "sharded_lm_solve",
    "sharded_triangulate",
    "assign_videos_to_host",
    "distributed_calibration_detection",
    "gather_detections",
    "shard_ba_inputs",
]
