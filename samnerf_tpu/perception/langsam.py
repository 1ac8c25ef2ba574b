"""LanguageSAM: text -> mask on a single image (ClipSeg points -> SAM).

Reference: ``samnerf/langsam.py:13-145`` — ClipSeg sigmoid heatmap
(:100-101), 16x16 average pooling (:102), threshold + top-k point selection
(:104-111), coordinate rescale to image size (:119-121), SAM predict with
positive labels (:60-72, 127), colored mask composite (:46-58).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from samnerf_tpu.perception.clipseg.pipeline import ClipSegPredictor
from samnerf_tpu.perception.sam.predictor import SamPredictor


def show_mask(mask: np.ndarray, rng: Optional[np.random.Generator] = None,
              random_color: bool = False) -> np.ndarray:
    """[h, w] bool -> RGBA overlay (``samnerf/sam_utils.py:27-34``)."""
    if random_color:
        rng = rng or np.random.default_rng()
        color = np.concatenate([rng.random(3), [0.6]])
    else:
        color = np.array([30 / 255, 144 / 255, 255 / 255, 0.6])
    return mask[..., None] * color[None, None]


def composite_mask(mask: np.ndarray, image: np.ndarray,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Blend mask color over image (``samnerf/sam_utils.py:37-42``)."""
    m = show_mask(mask, rng=rng, random_color=True)
    return m[..., :3] * m[..., 3:] + image * (1 - m[..., 3:])


def heatmap_to_points(heat: np.ndarray, image_hw: Tuple[int, int],
                      point_num: int = 5, threshold: float = 0.5,
                      rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Sigmoid heatmap [512, 512] -> point prompts [N, 2] (x, y) in image
    pixels (``langsam.py:100-121``)."""
    h16, w16 = heat.shape[0] // 16, heat.shape[1] // 16
    pooled = heat.reshape(h16, 16, w16, 16).mean(axis=(1, 3))
    inds = np.argwhere(pooled > threshold)  # [M, 2] (row, col)
    if inds.shape[0] > 0:
        vals = pooled[inds[:, 0], inds[:, 1]]
        if point_num > 0:
            k = min(point_num, vals.shape[0])
            sel = np.argsort(-vals)[:k]
        else:
            rng = rng or np.random.default_rng()
            sel = rng.permutation(vals.shape[0])[:-point_num]
        inds = inds[sel]
    pts = inds.astype(np.float64)
    pts[:, 0] = pts[:, 0] / pooled.shape[0] * image_hw[0]
    pts[:, 1] = pts[:, 1] / pooled.shape[1] * image_hw[1]
    return pts[:, ::-1].copy()  # (x, y)


class LanguageSAM:
    def __init__(self, sam_predictor: SamPredictor,
                 clipseg: ClipSegPredictor):
        self.predictor = sam_predictor
        self.clipseg = clipseg
        self.image: Optional[np.ndarray] = None
        self.clipseg_feature: Optional[np.ndarray] = None

    def set_image(self, image: np.ndarray) -> None:
        """image HWC uint8 (``langsam.py:74-95``); skips recompute if same."""
        if (self.image is not None and image.shape == self.image.shape
                and np.array_equal(image, self.image)):
            return
        self.image = image
        self.predictor.set_image(image)

    def get_mask_by_prompt(self, prompt: str, point_num: int = 5,
                           threshold: float = 0.5,
                           points: Optional[np.ndarray] = None) -> np.ndarray:
        cond = self.clipseg.encode_text([prompt])
        heat = np.asarray(self.clipseg.segment(self.image, cond))
        heat = 1.0 / (1.0 + np.exp(-heat))  # sigmoid (langsam.py:100)
        self.clipseg_feature = heat
        pts = heatmap_to_points(heat, self.image.shape[:2],
                                point_num=point_num, threshold=threshold)
        if points is not None:
            pts = np.concatenate([pts, points], axis=0)
        if pts.shape[0] == 0:
            return self.image.astype(np.float32) / 255.0
        labels = np.ones(pts.shape[0], np.int32)
        masks, scores, _ = self.predictor.predict(
            point_coords=pts, point_labels=labels, multimask_output=False)
        mask = masks[0]
        return composite_mask(mask, self.image.astype(np.float32) / 255.0)

    def set_and_segment(self, image: np.ndarray, prompt: str, pts: int = 5,
                        thres: float = 0.5,
                        points: Optional[np.ndarray] = None) -> np.ndarray:
        """``langsam.py:134-145``."""
        self.set_image(image)
        return self.get_mask_by_prompt(prompt, point_num=pts, threshold=thres,
                                       points=points)
