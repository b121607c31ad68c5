#!/bin/bash
# Bounded-memory training: run train.py in checkpoint-resume chunks.
#
# Rationale: on the axon remote-tunnel backend, a long-lived training process
# accumulates host-side buffer handles (observed ~1.8 GB/epoch; a 73-epoch
# continuous run was OOM-killed at 130 GB RSS, dmesg 2026-08-21). The trainer
# checkpoints every epoch and resumes exactly (utils/resume.py semantics), so
# capping each process's wall-clock and relaunching is lossless: each chunk
# re-pays only the jit compile (~5 min via the persistent cache).
#
# Usage: tools/chunked_train.sh SAVE_DIR TARGET_EPOCH CHUNK_SECONDS [extra train.py args...]
set -u
SAVE_DIR=$1; TARGET=$2; CHUNK=$3; shift 3
cd "$(dirname "$0")/.."
PREV=-2
while true; do
  EPOCH=$(python - "$SAVE_DIR" <<'EOF'
import json, sys, os
p = os.path.join(sys.argv[1], "last.ckpt.json")
print(json.load(open(p))["epoch"] if os.path.exists(p) else -1)
EOF
)
  echo "[chunked_train] last checkpoint epoch: $EPOCH (target $TARGET)"
  if [ "$EPOCH" -ge "$((TARGET - 1))" ]; then
    echo "[chunked_train] target reached"
    exit 0
  fi
  if [ "$EPOCH" -le "$PREV" ]; then
    # a chunk made zero epoch progress (e.g. killed before its first
    # checkpoint): relaunching the identical chunk would spin forever
    echo "[chunked_train] no progress since last chunk (epoch $EPOCH); aborting"
    exit 1
  fi
  PREV=$EPOCH
  RESUME=()
  [ -f "$SAVE_DIR/last.ckpt" ] && RESUME=(--resume "$SAVE_DIR/last.ckpt")
  timeout "$CHUNK" python train.py --save-dir "$SAVE_DIR" \
    "${RESUME[@]}" --epochs "$TARGET" "$@"
  RC=$?
  # 124 = chunk wall-clock cap, 137 = OOM/SIGKILL (progress check above
  # catches a kill loop); anything else but 0 is a real error
  if [ "$RC" -ne 124 ] && [ "$RC" -ne 0 ] && [ "$RC" -ne 137 ]; then
    echo "[chunked_train] train.py failed rc=$RC"; exit "$RC"
  fi
  if [ "$RC" -eq 0 ]; then
    # trainer exited cleanly before TARGET: --patience early stopping (or the
    # target itself, caught at loop top). A clean finish is success — without
    # this, the unchanged checkpoint epoch would trip the no-progress guard
    # and report a successful run as a failure.
    echo "[chunked_train] trainer completed cleanly at epoch $EPOCH (early stop or target)"
    exit 0
  fi
done
