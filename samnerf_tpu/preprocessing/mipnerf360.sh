#!/usr/bin/env bash
# Preprocessing driver — same interface as the reference's
# samnerf/preprocessing/mipnerf360.sh:9-19:
#   bash mipnerf360.sh <scene_dir> json     # LLFF poses -> transforms_*.json
#   bash mipnerf360.sh <scene_dir> feature  # SAM + ClipSeg feature maps
set -euo pipefail
SCENE=$1
MODE=$2
case "$MODE" in
  json)
    python -m samnerf_tpu.preprocessing.llff2nerf \
      --scenedir "$SCENE" --images images_4 --downscale 4 --hold 8
    ;;
  feature)
    python -m samnerf_tpu.preprocessing.get_image_embeddings \
      --image_dir "$SCENE/images_4" --out_dir "$SCENE/sam_features"
    python -m samnerf_tpu.preprocessing.get_clipseg_embeddings \
      --image_dir "$SCENE/images_4" --out_dir "$SCENE/clipseg_features"
    ;;
  *)
    echo "usage: mipnerf360.sh <scene> json|feature" >&2; exit 2;;
esac
