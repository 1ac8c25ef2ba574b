#!/bin/bash
# Round-4 TPU queue, part 3: per-variant device-op traces of the serve
# frame (waits for queue2: /tmp/r4/queue2.pid).
#
# WHAT ACTUALLY RAN (recorded round 5): executed between rounds 4 and 5;
# its k4/k6/k4q4sam rows landed in docs/SERVE_AB_r5_baked.json (combined
# with queue2's), not the docs/SERVE_AB_r4_k.json declared below; the
# trace logs went to /tmp and were lost — wave-2
# (scripts/run_round5_queue.sh item 3) re-traces the winner.
set -x
cd /root/repo

Q2=$(cat /tmp/r4/queue2.pid 2>/dev/null)
while [ -n "$Q2" ] && kill -0 "$Q2" 2>/dev/null; do sleep 60; done
sleep 10

timeout 5400 python scripts/bench_serve_static.py \
  --load /tmp/qruns/serve_ab --run-name serve_ab \
  --variants base,k4,k6,k4q4sam --trace \
  --out docs/SERVE_AB_r4_k.json 2>&1 | tee /tmp/r4/serve_trace.log

echo "QUEUE3 DONE"
