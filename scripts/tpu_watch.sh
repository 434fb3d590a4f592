#!/bin/bash
# Probe the axon TPU every 15 min; when it answers, run the TPU
# measurement battery once (bench, detection fps, scaling sweep, stage
# profiles) and exit. Logs under /tmp/tpu_battery/.
set -u
mkdir -p /tmp/tpu_battery
cd /root/repo
while true; do
  # -k: the axon backend hangs inside C-grpc where SIGTERM is ignored
  # (same reason bench.py uses a SIGKILL watchdog ladder). 180 s probe:
  # a healthy backend answers in ~20-40 s; when axon is down the probe
  # hangs, so the timeout sets the detection latency.
  timeout -k 30 180 python -c "
import jax
d = jax.devices()
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((64, 64)))) == 4096.0
print('TPU-UP', d)
" > /tmp/tpu_battery/probe.log 2>&1
  if grep -q TPU-UP /tmp/tpu_battery/probe.log; then
    echo "$(date -u +%FT%TZ) axon up — running battery" >> /tmp/tpu_battery/status.log
    # Parity FIRST: compiled-kernel-vs-XLA blocks + full-descent assert on
    # the real chip (the gate any hardware-default flip must cite).
    timeout -k 60 5400 python scripts/tpu_parity.py > /tmp/tpu_battery/parity.log 2>&1
    echo "parity rc=$?" >> /tmp/tpu_battery/status.log
    timeout -k 60 3600 python bench.py > /tmp/tpu_battery/bench.log 2>&1
    echo "bench rc=$?" >> /tmp/tpu_battery/status.log
    timeout -k 60 3600 python scripts/bench_detection.py > /tmp/tpu_battery/detection.log 2>&1
    echo "detection rc=$?" >> /tmp/tpu_battery/status.log
    timeout -k 60 5400 python scripts/bench_sweep.py > /tmp/tpu_battery/sweep.log 2>&1
    echo "sweep rc=$?" >> /tmp/tpu_battery/status.log
    timeout -k 60 3600 python scripts/bench_streaming.py > /tmp/tpu_battery/streaming.log 2>&1
    echo "streaming rc=$?" >> /tmp/tpu_battery/status.log
    timeout -k 60 3600 python scripts/profile_detection_stages.py > /tmp/tpu_battery/det_stages.log 2>&1
    echo "det_stages rc=$?" >> /tmp/tpu_battery/status.log
    # 6cam bench config + config 5 (64cam x 20k, frame_chunk 256) with the
    # pallas+cost full-solve variant — the VERDICT r4 #6 decomposition.
    timeout -k 60 3600 python scripts/profile_lm_stages.py 6 1000 64 20000:256 > /tmp/tpu_battery/lm_stages.log 2>&1
    echo "lm_stages rc=$?" >> /tmp/tpu_battery/status.log
    echo "$(date -u +%FT%TZ) battery done" >> /tmp/tpu_battery/status.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) axon still down" >> /tmp/tpu_battery/status.log
  sleep 300
done
