"""Metrics/observability subsystem tests."""
import json

import numpy as np

import multicam_calibration_tpu as mct
from multicam_calibration_tpu.utils.metrics import Metrics, metrics


def test_metrics_disabled_noop():
    m = Metrics()
    m.configure(None)
    m.log("x", a=1)  # must not raise or write
    with m.timer("stage"):
        pass
    assert "stage" in m.stage_times


def test_metrics_jsonl_sink(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = Metrics().configure(p)
    m.log("custom", value=3.5, arr=np.float32(2.0))
    with m.timer("work", items=4):
        pass
    m.configure(None)  # flush/close
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "custom"
    assert lines[0]["value"] == 3.5
    assert lines[0]["arr"] == 2.0
    assert lines[1]["event"] == "stage_time"
    assert lines[1]["stage"] == "work"
    assert lines[1]["seconds"] >= 0


def test_profile_context_writes_trace(tmp_path):
    import os

    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    m = Metrics()
    with m.profile(d):
        _ = jnp.arange(8).sum()
    # jax.profiler.trace writes a plugins/profile tree under the logdir.
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found  # trace artifacts exist


def test_pipeline_emits_stage_times(tmp_path):
    p = str(tmp_path / "pipe.jsonl")
    metrics.configure(p)
    try:
        rig = mct.make_synthetic_rig(
            n_cameras=2, n_frames=12, noise_px=0.3, dropout=0.0, seed=1
        )
        ext, intr, poses, _ = mct.calibrate(
            rig.all_calib_uvs, rig.img_sizes, rig.calib_objpoints,
            verbose=False, n_samples_for_intrinsics=10,
        )
        mct.bundle_adjust(
            rig.all_calib_uvs, ext, intr, rig.calib_objpoints, poses,
            verbose=False,
        )
    finally:
        metrics.configure(None)
    events = [json.loads(l) for l in open(p)]
    stages = {e.get("stage") for e in events if e["event"] == "stage_time"}
    assert {"calibrate.intrinsics", "calibrate.poses", "ba.lm_solve"} <= stages
    assert any(e["event"] == "ba_result" for e in events)
