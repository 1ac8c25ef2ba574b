"""Precomputed feature-map loader for distillation targets.

Reference: ``samnerf/data/feature_loader.py:13-52`` — loads all per-image
feature maps into one ``[n, h, w, c]`` array and nearest-neighbor looks up
features at scaled pixel coordinates.

TPU redesign: features stay in **host** memory as one numpy array (the
reference pins ~GBs of fp32 features in GPU HBM, SURVEY.md 'hard parts' #5);
per-step lookups are host-side numpy gathers feeding the device batch.
``.pt`` files are read via torch (CPU) and converted.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def _default_get_feature(x):
    return x


class FeatureLoader:
    def __init__(self, paths: Sequence[str], image_shape: Tuple[int, int],
                 get_feature: Optional[Callable] = None,
                 dtype=np.float32):
        self.image_shape = image_shape
        feats = []
        for p in paths:
            p = str(p)
            if p.endswith(".npy"):
                f = np.load(p)
                f = np.moveaxis(f, 0, -1)  # c h w -> h w c (feature_loader.py:31)
            elif p.endswith(".pt"):
                import torch  # CPU-only, host side
                obj = torch.load(p, map_location="cpu", weights_only=False)
                f = (get_feature or _default_get_feature)(obj)
                if hasattr(f, "numpy"):
                    f = f.detach().numpy()
            else:
                raise ValueError(f"unsupported feature file {p}")
            feats.append(np.asarray(f, dtype=dtype))
        self.features = np.stack(feats, axis=0)  # [n, h, w, c]

    @property
    def feature_dim(self) -> int:
        return self.features.shape[-1]

    def __call__(self, img_points: np.ndarray) -> np.ndarray:
        """img_points [B, 3] = (image, row, col) -> [B, c].

        Nearest lookup at scaled coords (``feature_loader.py:45-52``; note the
        reference's (x_ind, y_ind) are (row, col) in its convention).
        """
        sy = self.features.shape[1] / self.image_shape[0]
        sx = self.features.shape[2] / self.image_shape[1]
        r = (img_points[:, 1] * sy).astype(np.int64)
        c = (img_points[:, 2] * sx).astype(np.int64)
        return self.features[img_points[:, 0].astype(np.int64), r, c]


def clipseg_pt_to_grid(obj) -> np.ndarray:
    """Convert a saved ClipSeg activation dict to a 32x32x192 grid.

    Reference: ``samnerf/datamanager.py:92-95`` — concat the 3 reduced
    activations, drop the CLS token, reshape to (512/16, 512/16, -1).
    """
    import torch
    acts = torch.cat(obj["activations"], dim=-1).squeeze()[1:, ...]
    return acts.reshape(512 // 16, 512 // 16, -1).numpy()
