"""Precompute SAM image-encoder embeddings for every training image.

Reference: ``samnerf/preprocessing/get_image_embeddings.py:23-61`` — run the
SAM ViT encoder per image, crop the padded square 64x64 embedding back to
the image aspect, save ``sam_features/<stem>.npy`` as ``[256, h, w]``.

Usage: ``python -m samnerf_tpu.preprocessing.get_image_embeddings <scene>
--checkpoint sam_vit_h_4b8939.pth [--model-type vit_h] [--images images]``.
"""
from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np


def get_embeddings(scene: Path, checkpoint: str, model_type: str = "vit_h",
                   images_dir: str = "images") -> None:
    from PIL import Image

    from samnerf_tpu.perception.sam.build_sam import sam_model_registry
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    sam, params = sam_model_registry[model_type](checkpoint=checkpoint)
    predictor = SamPredictor(sam, params)

    out_dir = Path(scene) / "sam_features"
    out_dir.mkdir(exist_ok=True)
    paths = sorted((Path(scene) / images_dir).iterdir())
    for p in paths:
        if p.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = np.asarray(Image.open(p).convert("RGB"))
        predictor.set_image(img)
        emb = np.asarray(predictor.get_image_embedding()[0])  # [64, 64, 256]
        h, w = img.shape[:2]
        # crop padded square embedding to aspect (reference :29-34)
        if h < w:
            fh = int(math.ceil(h / w * emb.shape[0]))
            emb = emb[:fh]
        elif h > w:
            fw = int(math.ceil(w / h * emb.shape[1]))
            emb = emb[:, :fw]
        np.save(out_dir / f"{p.stem}.npy",
                emb.transpose(2, 0, 1).astype(np.float32))  # [256, h, w]
        print(f"saved {p.stem}.npy {emb.shape}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("scene", type=str)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--model-type", type=str, default="vit_h")
    p.add_argument("--images", type=str, default="images")
    a = p.parse_args(argv)
    get_embeddings(Path(a.scene), a.checkpoint, a.model_type, a.images)


if __name__ == "__main__":
    main()
