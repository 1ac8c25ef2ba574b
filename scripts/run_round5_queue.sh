#!/bin/bash
# Round-5 TPU queue: records the actual invocations used this round,
# serialized on the one chip (items were launched individually as the
# previous item finished; this file is the log of record).
#
# NOTE on the round-4 queue's declared outputs: queue2/queue3 ran
# between rounds and wrote their rows into ONE combined artifact,
# docs/SERVE_AB_r5_baked.json (13 variants: queue2's 10 + queue3's
# k4/k6/k4q4sam), instead of the two files the scripts declared
# (docs/SERVE_AB_r4_baked.json / docs/SERVE_AB_r4_k.json) — those
# paths never existed; SERVE_AB_r5_baked.json supersedes both.
set -x
cd /root/repo
mkdir -p /tmp/r5

# 1) Round-5 composite serve A/B on the persisted serve_ab checkpoint
#    (VERDICT r4 #2/#3): compose the quality-passing levers.
#    -> docs/SERVE_AB_r5_combo.json  (k4q4sambake0: 3.49 FPS, 38.7 dB)
timeout 3600 python scripts/bench_serve_static.py \
  --load /tmp/qruns/serve_ab --run-name serve_ab \
  --variants base,k4q4sam,k4q4samslab8,k4q4samslab16,k4q4sambake0,k4q4samc16,k6q4samslab8,k4q4samp4 \
  --out docs/SERVE_AB_r5_combo.json 2>&1 | tee /tmp/r5/serve_combo.log

# 2) Full reference-schedule run + upgraded closed-loop mIoU study
#    (VERDICT r4 #1: samconfigs.py:109,120-121 = 10k steps x 16384 rays;
#    train-view rows + GT-image columns; 64x64 prompt grid).
#    Checkpoints every 2500 steps; resumable via --resume.
timeout 21000 python scripts/quality_distill_miou.py \
  --steps 10000 --rays 16384 --views 32 --res 256 --detail 3 \
  --grid 64 --test-views 4 --persist --save-every 2500 \
  --run-name ref-schedule-10k 2>&1 | tee /tmp/r5/miou_full.log

# 3) Serve A/B wave 2 (bf16 MLPs now that the scans shrank, deeper k
#    trims, chunk/kernel probes) + device trace of the winner.
timeout 5400 python scripts/bench_serve_static.py \
  --load /tmp/qruns/serve_ab --run-name serve_ab \
  --variants base,k4q4sambake0,k4q4sambf16,k3q4sam,k2q4sam,k4q4samc14,k4q4samv4 \
  --out docs/SERVE_AB_r5_w2.json 2>&1 | tee /tmp/r5/serve_w2.log

# 4) Capacity-sensitive scene study (VERDICT r4 #1c): smooth continuous
#    texture + higher detail so reconstruction error tracks capacity.
timeout 10800 python scripts/quality_capacity.py \
  --capacities 15:13,19:17 --steps 2000 \
  --rays 8192 --views 48 --res 512 --detail 8 --smooth-texture \
  --hash-fn morton 2>&1 | tee /tmp/r5/capacity.log

# 5) At-capacity training throughput, v2 vs v4 on current code
#    (VERDICT r4 #6; morton+sort_points is the method-config default,
#    configs/methods.py:94) -> settles the kernel default with a
#    current number and rechecks the 13.9k->13.5k in-bench drift.
timeout 3600 python scripts/bench_train_throughput.py --steps 300 \
  2>&1 | tee /tmp/r5/train_tp_v2.log
SAMNERF_HASH_KERNEL=v4 timeout 3600 \
  python scripts/bench_train_throughput.py --steps 300 \
  2>&1 | tee /tmp/r5/train_tp_v4.log

# 6) instant-ngp zoo re-validation after the random-background fix
#    (VERDICT r4 #7).
timeout 7200 python scripts/validate_zoo.py --views 64 \
  --methods instant-ngp:2000 --out /tmp/r5/zoo_ingp.md \
  2>&1 | tee /tmp/r5/zoo_ingp.log

echo "QUEUE DONE"
