"""Stateful SamPredictor: set_image / set_feature / predict.

Reference: ``samnerf/segment_anything/predictor.py:19-305``, including the
distillation hook ``set_feature`` (:100-127) that injects an
externally-rendered 256-d embedding (zero-padding a rectangular map to the
square 64x64 grid) in place of running the ViT encoder.

TPU redesign: the decode path is jitted once per (num_prompt-bucket,
multimask) signature; point prompts are padded to a small set of static
bucket sizes with label -1 (the prompt encoder's native "not a point"
padding, ``prompt_encoder.py:81-88``) so interactive clicking never
recompiles.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samnerf_tpu.perception.sam.sam import Sam, postprocess_masks
from samnerf_tpu.perception.sam.transforms import ResizeLongestSide

_PROMPT_BUCKETS = (1, 4, 16, 64, 256, 1024, 2048)


def _bucket(n: int) -> int:
    for b in _PROMPT_BUCKETS:
        if n <= b:
            return b
    return int(2 ** math.ceil(math.log2(n)))


class SamPredictor:
    def __init__(self, sam_model: Sam, params) -> None:
        self.model = sam_model
        self.params = params
        self.transform = ResizeLongestSide(sam_model.image_encoder.img_size)
        self._encode = jax.jit(
            lambda p, x: self.model.apply(p, x, method=Sam.encode_image))
        self._decode = {}
        self.reset_image()

    def reset_image(self) -> None:
        self.is_image_set = False
        self.features = None
        self.original_size = None
        self.input_size = None

    # --- image / feature ingestion -----------------------------------------
    def set_image(self, image: np.ndarray, image_format: str = "RGB") -> None:
        """image: HWC uint8 (``predictor.py:36-67``)."""
        assert image_format in ("RGB", "BGR")
        if image_format == "BGR":
            image = image[..., ::-1]
        input_image = self.transform.apply_image(image)
        self.original_size = tuple(image.shape[:2])
        self.input_size = tuple(input_image.shape[:2])
        x = jnp.asarray(input_image, jnp.float32)[None]  # [1, h, w, 3]
        x = self.model.preprocess(x)
        self.features = self._encode(self.params, x)  # [1, 64, 64, 256]
        self.is_image_set = True

    def set_feature(self, feature, original_image_size: Tuple[int, int]) -> None:
        """Inject a rendered embedding (``predictor.py:100-127``).

        feature: [h, w, 256] (h or w == 64); NHWC here (reference is CHW).
        """
        self.reset_image()
        self.original_size = tuple(original_image_size)
        h, w = self.original_size
        img_size = self.model.image_encoder.img_size
        if h <= w:
            self.input_size = (int(math.ceil(h / w * img_size)), img_size)
        else:
            self.input_size = (img_size, int(math.ceil(w / h * img_size)))
        feature = jnp.asarray(feature)
        fh, fw, c = feature.shape
        if fh < fw:
            feature = jnp.concatenate(
                [feature, jnp.zeros((fw - fh, fw, c))], axis=0)
        elif fh > fw:
            feature = jnp.concatenate(
                [feature, jnp.zeros((fh, fh - fw, c))], axis=1)
        self.features = feature[None]
        self.is_image_set = True

    # --- prediction ----------------------------------------------------------
    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Same contract as ``predictor.py:129-204`` (numpy in/out,
        masks [C, H, W] at original size)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) "
                               "before mask prediction.")
        coords = labels = boxes = mask_in = None
        if point_coords is not None:
            assert point_labels is not None
            pc = self.transform.apply_coords(point_coords, self.original_size)
            n = pc.shape[0]
            b = _bucket(n)
            coords = np.zeros((1, b, 2), np.float32)
            labels = -np.ones((1, b), np.int32)
            coords[0, :n] = pc
            labels[0, :n] = point_labels
        if box is not None:
            boxes = self.transform.apply_boxes(box, self.original_size)
            boxes = boxes.astype(np.float32)
        if mask_input is not None:
            # reference is [1, 256, 256]; NHWC here
            mask_in = np.asarray(mask_input, np.float32)[None, ..., None]
            mask_in = mask_in.reshape(1, *mask_input.shape[-2:], 1)

        key = (None if coords is None else coords.shape[1],
               boxes is not None, mask_in is not None, multimask_output)
        if key not in self._decode:
            has_points = coords is not None

            def fn(params, features, coords, labels, boxes, mask_in, nv):
                points = (coords, labels) if has_points else None
                return self.model.apply(
                    params, features, points, boxes, mask_in,
                    multimask_output, num_valid_points=nv,
                    method=Sam.decode_masks)

            self._decode[key] = jax.jit(fn)
        # None args are baked into the traced jaxpr; the bucket key keeps
        # retraces bounded across interactive clicking.  num_valid is a
        # traced scalar, so any real prompt count within a bucket reuses
        # the same executable while staying numerically exact.
        low_res_masks, iou_pred = self._decode[key](
            self.params, self.features,
            None if coords is None else jnp.asarray(coords),
            None if labels is None else jnp.asarray(labels),
            None if boxes is None else jnp.asarray(boxes),
            None if mask_in is None else jnp.asarray(mask_in),
            None if coords is None else jnp.int32(n))

        masks = postprocess_masks(low_res_masks, self.input_size,
                                  self.original_size,
                                  self.model.image_encoder.img_size)
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return (np.asarray(masks[0]), np.asarray(iou_pred[0]),
                np.asarray(low_res_masks[0]))

    def predict_batched(self, point_coords: np.ndarray,
                        point_labels: np.ndarray,
                        multimask_output: bool = True,
                        return_logits: bool = False):
        """B independent prompt sets at once (reference ``predict_torch``,
        ``predictor.py:206-281``): coords [B, N, 2] already in the input
        frame, labels [B, N].  Returns (masks [B, C, H, W], iou [B, C],
        low_res [B, C, 256, 256]) as numpy."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set before mask prediction.")
        key = ("batched", point_coords.shape[1:], multimask_output)
        if key not in self._decode:
            def fn(params, features, coords, labels):
                return self.model.apply(
                    params, features, (coords, labels), None, None,
                    multimask_output, method=Sam.decode_masks)
            self._decode[key] = jax.jit(fn)
        low_res, iou = self._decode[key](
            self.params, self.features,
            jnp.asarray(point_coords, jnp.float32),
            jnp.asarray(point_labels, jnp.int32))
        masks = postprocess_masks(low_res, self.input_size, self.original_size,
                                  self.model.image_encoder.img_size)
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return np.asarray(masks), np.asarray(iou), np.asarray(low_res)

    def get_image_embedding(self) -> jax.Array:
        if not self.is_image_set:
            raise RuntimeError("image not set")
        return self.features
