#!/bin/bash
# Round-4 TPU queue: the long evidence runs, serialized on the one chip.
# Launch:  nohup bash scripts/run_round4_queue.sh > /tmp/r4/queue.log 2>&1 &
set -x
cd /root/repo

# 1) Full zoo validation sweep -> docs/ZOO.md (VERDICT #1).
#    Per-method step budgets: pure-MLP methods need more steps to clear
#    trivial+3dB; the very slow ones (mipnerf 2s/step, nerfplayer 2-5s/step)
#    get bounded budgets so the sweep stays ~2h.
python scripts/validate_zoo.py --methods \
vanilla-nerf:2400,tensorf:2000,instant-ngp:1200,depth-nerfacto:1000,semantic-nerfw:1000,mipnerf:1200,nerfplayer-nerfacto:500,nerfplayer-ngp:600 \
  --out docs/ZOO.md 2>&1 | tee /tmp/r4/zoo_full.log

# 2) Full reference-schedule training run (samconfigs.py:109,120-121:
#    10k steps x 16384 rays) + the upgraded closed-loop mIoU study on its
#    checkpoint (VERDICT #3 + #4's schedule half).  Persisted run dir
#    with checkpoints every 2500 steps + eval renders.
python scripts/quality_distill_miou.py --steps 10000 --rays 16384 \
  --views 32 --res 256 --detail 3 --grid 64 --test-views 4 \
  --persist --save-every 2500 --run-name ref-schedule-10k \
  2>&1 | tee /tmp/r4/miou_full.log

# 3) Capacity-sensitive scene study (VERDICT #6): smooth continuous
#    texture + supersampled GT + higher detail so reconstruction error
#    tracks capacity instead of edge aliasing.
python scripts/quality_capacity.py --capacities 15:13,19:17 --steps 2000 \
  --rays 8192 --views 48 --res 512 --detail 8 --smooth-texture \
  --hash-fn morton 2>&1 | tee /tmp/r4/capacity.log

echo "QUEUE DONE"
