#!/usr/bin/env bash
# Preprocessing driver. Reference: samnerf/preprocessing/mipnerf360.sh:9-19.
# Usage: bash mipnerf360.sh <scene_dir> json|feature [sam_ckpt] [clipseg_ckpt] [clip_ckpt]
set -e
SCENE=$1
MODE=$2
if [ "$MODE" = "json" ]; then
    python -m samnerf_tpu.preprocessing.llff2nerf "$SCENE" --images images_8 --downscale 8 --hold 8
elif [ "$MODE" = "feature" ]; then
    SAM_CKPT=${3:-sam_vit_h_4b8939.pth}
    CLIPSEG_CKPT=${4:-rd64-uni.pth}
    CLIP_CKPT=${5:-ViT-B-16.pt}
    python -m samnerf_tpu.preprocessing.get_image_embeddings "$SCENE" --checkpoint "$SAM_CKPT" --images images_8
    python -m samnerf_tpu.preprocessing.get_clipseg_embeddings "$SCENE" --clipseg-checkpoint "$CLIPSEG_CKPT" --clip-checkpoint "$CLIP_CKPT" --images images_8
else
    echo "usage: mipnerf360.sh <scene> json|feature" >&2
    exit 2
fi
