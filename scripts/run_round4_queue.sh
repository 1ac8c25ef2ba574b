#!/bin/bash
# Round-4 TPU queue: the long evidence runs, serialized on the one chip.
# Items are launched INDIVIDUALLY (not as one monolithic script) so
# interactive kernel A/B work can be scheduled between them; this file
# records the actual invocations used this round.
set -x
cd /root/repo

# 1) Full zoo validation sweep -> docs/ZOO.md (VERDICT #1).
#    Protocol informed by the round-3-tail quick sweep (/tmp/r4/zoo_quick.md):
#    - 64 train views (24 views let the grid methods memorize: instant-ngp
#      hit train-PSNR ~32 dB / eval 13.4 — an overfit gap, not a bug);
#    - per-method step budgets sized by MEASURED per-step cost: vanilla-nerf
#      steps are 0.076s (its 1342s quick run was ~1250s compile), so it gets
#      14k steps; nerfplayer-* are 2.5-4s/step so they get few.
python scripts/validate_zoo.py --views 64 --methods \
semantic-nerfw:8000,depth-nerfacto:8000,instant-ngp:2000,vanilla-nerf:14000,mipnerf:4000,tensorf:2500,nerfplayer-ngp:600,nerfplayer-nerfacto:400 \
  --out docs/ZOO.md 2>&1 | tee /tmp/r4/zoo_full.log

# (interactive serve-kernel A/B work happens here)

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
