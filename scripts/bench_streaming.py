"""RollingCalibrator.update latency at rig scale (VERDICT r1 weak #7).

BASELINE config 4 at the sizes this framework advertises: 64 cameras,
window 256, batches of 8 frames. Measures steady-state update latency
(window full, evictions active) and writes BENCH_STREAMING.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CAMERAS = 64
WINDOW = 256
BATCH = 8
N_UPDATES = 12  # timed, after the warm-up/fill phase


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    import multicam_calibration_tpu as mct
    from multicam_calibration_tpu.models.streaming import RollingCalibrator

    rig = mct.make_synthetic_rig(
        n_cameras=N_CAMERAS, n_frames=WINDOW + BATCH * (N_UPDATES + 4),
        noise_px=0.3, dropout=0.25, seed=11,
    )
    rc = RollingCalibrator(
        rig.all_extrinsics, rig.all_intrinsics, rig.calib_objpoints,
        window=WINDOW,
    )
    # Fill the window (compiles the update program once).
    f = 0
    while rc.occupancy < WINDOW:
        rc.update(rig.all_calib_uvs[:, f : f + BATCH])
        f += BATCH
    walls = []
    for _ in range(N_UPDATES):
        t0 = time.time()
        info = rc.update(rig.all_calib_uvs[:, f : f + BATCH])
        walls.append(time.time() - t0)
        f += BATCH
    lat = float(np.median(walls))
    rec = {
        "n_cameras": N_CAMERAS,
        "window": WINDOW,
        "batch": BATCH,
        "update_latency_s": round(lat, 4),
        "updates_per_s": round(1.0 / lat, 2),
        "frames_per_s": round(BATCH / lat, 1),
        "final_cost": float(info.get("cost", float("nan"))),
        "occupancy": rc.occupancy,
        "platform": jax.default_backend(),
    }
    print(json.dumps(rec))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAMING.json",
    )
    with open(out, "w") as fjson:
        json.dump(rec, fjson, indent=1)


if __name__ == "__main__":
    main()
