#!/bin/bash
# Round-4 TPU queue, part 2: runs detached (setsid), serialized behind the
# resumed ref-schedule-10k run (PID in /tmp/r4/miou2.pid).  Each item writes
# incremental results into the repo so interruptions still land evidence.
#
# WHAT ACTUALLY RAN (recorded round 5): item 0's wait never released in
# round 4 (the 10k run did not finish), so item 1 executed only between
# rounds and wrote its rows — COMBINED with queue3's — into
# docs/SERVE_AB_r5_baked.json, not the docs/SERVE_AB_r4_baked.json
# declared below.  Item 2 (capacity) did not run; it is queue item 4 of
# scripts/run_round5_queue.sh.
set -x
cd /root/repo

# 0) wait for the 10k reference-schedule run to finish
MIOU_PID=$(cat /tmp/r4/miou2.pid 2>/dev/null)
while [ -n "$MIOU_PID" ] && kill -0 "$MIOU_PID" 2>/dev/null; do sleep 60; done
sleep 10

# 1) second-wave serve A/B (baked tables, per-field int4, fixed fused
#    kernel) — the variants committed in c36e7f4 but never measured.
#    Reuses the serve_ab checkpoint (no retrain).
timeout 5400 python scripts/bench_serve_static.py \
  --load /tmp/qruns/serve_ab --run-name serve_ab \
  --variants base,bake,bakeopt,q4sam,q4samopt,q4opt,fusedfix,fusedfixq4,best,q4slab8 \
  --out docs/SERVE_AB_r4_baked.json 2>&1 | tee /tmp/r4/serve_ab_baked.log

# 2) capacity-sensitive scene study (VERDICT #6)
timeout 10800 python scripts/quality_capacity.py \
  --capacities 15:13,19:17 --steps 2000 \
  --rays 8192 --views 48 --res 512 --detail 8 --smooth-texture \
  --hash-fn morton 2>&1 | tee /tmp/r4/capacity.log

echo "QUEUE2 DONE"
