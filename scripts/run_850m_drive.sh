#!/bin/bash
# 850 m / 1000-KF scale drive with auto-resume: relaunch from the last
# checkpoint if the process dies (the r04 run was lost at frame ~2600 to
# a host XLA-CPU LLVM segfault; see PERF.md).
cd "$(dirname "$0")/.."
OUT=scale_drive_r5_850m.json
ARGS="--frames=2800 --points=345000 --features=1500 --stereo --r0=115 --max-depth=12.0 --ckpt-every=200 --out=$OUT"
for attempt in 1 2 3 4 5; do
  if [ "$attempt" = 1 ] && [ ! -f "$OUT.ckpt.pkl" ]; then
    JAX_PLATFORMS=cpu timeout 21600 python scripts/scale_drive.py $ARGS
  else
    JAX_PLATFORMS=cpu timeout 21600 python scripts/scale_drive.py $ARGS --resume
  fi
  rc=$?
  if [ -f "$OUT" ]; then
    echo "[supervisor] drive complete (attempt $attempt, rc=$rc)"
    exit 0
  fi
  echo "[supervisor] attempt $attempt died rc=$rc; resuming from checkpoint"
  sleep 5
done
echo "[supervisor] giving up after 5 attempts"
exit 1
