#!/bin/bash
# Round-3 TPU measurement queue (VERDICT round-2 items #1-#4, #8).
# Runs each study sequentially on the real TPU, logging to /tmp/r3_*.log;
# safe to re-run — each step overwrites its own log. Fire with:
#   bash scripts/run_round3_queue.sh > /tmp/r3_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 0. (optional) serve-config sweep on one persisted checkpoint:
#    python scripts/tune_serve.py --ckpt /tmp/qruns/19-morton-1000 \
#        --configs A,E,F,G,K8,K4,FK4,FK8,H
# 1. Driver bench (trained serve through the measured presets)
timeout 2400 python bench.py > /tmp/r3_bench.log 2>&1
echo "bench exit=$?"

# 2. Closed distillation loop: distilled-features vs encoder masks (mIoU)
timeout 10800 python scripts/quality_distill_miou.py --views 64 \
    --test-views 3 > /tmp/r3_miou.log 2>&1
echo "miou exit=$?"

# 3. Capacity study on the high-frequency scene (monotone capacity->PSNR)
timeout 10800 python scripts/quality_capacity.py --steps 2000 --rays 8192 \
    --res 256 --views 48 --detail 8 --smooth-texture --hash-fn morton \
    > /tmp/r3_capacity.log 2>&1
echo "capacity exit=$?"

# 4. Zoo validation: every method trains + beats trivial PSNR
timeout 10800 python scripts/validate_zoo.py --steps 800 > /tmp/r3_zoo.log 2>&1
echo "zoo exit=$?"

echo "QUEUE DONE"
