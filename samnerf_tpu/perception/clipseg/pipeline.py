"""ClipSeg inference pipeline: image/text -> dense relevance logits, plus
the rendered-feature decode path used by distillation.

Reference flows:
- full image path: ``samnerf/langsam.py:90-101`` (ImageNet-normalized 512^2
  input -> CLIPDensePredT -> sigmoid heatmap);
- feature path: ``samnerf/sam_model.py:487-498`` (rendered 32x32x192
  activations packed into the ``inp_feature`` dict, CLS slot = token mean).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from samnerf_tpu.perception.clipseg.clip_model import (CLIPText, CLIPVisual,
                                                       convert_clip_state_dict)
from samnerf_tpu.perception.clipseg.clipseg import (CLIPDensePredT,
                                                    convert_clipseg_state_dict)
from samnerf_tpu.perception.clipseg import tokenizer as tok

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(image: np.ndarray, size: int = 512) -> np.ndarray:
    """HWC uint8/float -> [1, size, size, 3] ImageNet-normalized
    (``langsam.py:31-37``)."""
    from PIL import Image
    if image.dtype != np.uint8:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    pil = Image.fromarray(image).resize((size, size), Image.BILINEAR)
    x = np.asarray(pil, np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return x[None]


class ClipSegPredictor:
    """Holds the flax CLIP backbone + ClipSeg decoder and their params."""

    def __init__(self, clipseg_checkpoint: Optional[str] = None,
                 clip_checkpoint: Optional[str] = None,
                 bpe_path: Optional[str] = None,
                 extract_layers=(3, 6, 9), reduce_dim: int = 64,
                 seed: int = 0):
        self.visual = CLIPVisual()
        self.text = CLIPText()
        self.decoder = CLIPDensePredT(extract_layers=tuple(extract_layers),
                                      reduce_dim=reduce_dim)
        self.extract_layers = tuple(extract_layers)
        key = jax.random.PRNGKey(seed)
        kv, kt, kd = jax.random.split(key, 3)

        if clip_checkpoint is not None:
            import torch
            sd = torch.load(clip_checkpoint, map_location="cpu",
                            weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            vis, txt = convert_clip_state_dict(sd)
            self.visual_params = {"params": vis}
            self.text_params = {"params": txt}
        else:
            dummy = jnp.zeros((1, 224, 224, 3))
            self.visual_params = self.visual.init(kv, dummy)
            self.text_params = self.text.init(
                kt, jnp.zeros((1, 77), jnp.int32))

        if clipseg_checkpoint is not None:
            import torch
            sd = torch.load(clipseg_checkpoint, map_location="cpu",
                            weights_only=False)
            self.decoder_params = {"params": convert_clipseg_state_dict(
                sd, depth=len(self.extract_layers))}
        else:
            dummy_acts = [jnp.zeros((1, 197, 768))] * len(self.extract_layers)
            self.decoder_params = self.decoder.init(
                kd, dummy_acts, jnp.zeros((1, 512)))

        self.tokenizer = (tok.SimpleTokenizer(bpe_path)
                          if bpe_path is not None else None)
        self._jit_visual = jax.jit(
            lambda p, x: self.visual.apply(p, x,
                                           extract_layers=self.extract_layers))
        self._jit_text = jax.jit(lambda p, t: self.text.apply(p, t))
        self._jit_decode_full = jax.jit(
            lambda p, acts, cond: self.decoder.apply(p, acts, cond))
        self._jit_decode_reduced = jax.jit(
            lambda p, racts, cond: self.decoder.apply(
                p, racts, cond, method=CLIPDensePredT.decode))
        self._jit_reduce = jax.jit(
            lambda p, acts: self.decoder.apply(
                p, acts, method=CLIPDensePredT.reduce_activations))

    # --- conditionals -------------------------------------------------------
    def encode_text(self, texts: Union[str, Sequence[str]]) -> jax.Array:
        if self.tokenizer is None:
            raise RuntimeError(
                "no BPE vocab loaded; pass bpe_path=.../bpe_simple_vocab_16e6.txt.gz")
        tokens = tok.tokenize(self.tokenizer, texts)
        return self._jit_text(self.text_params, jnp.asarray(tokens))

    # --- full image path ----------------------------------------------------
    def segment(self, image: np.ndarray, cond: jax.Array) -> jax.Array:
        """image HWC -> logits [512, 512] (pre-sigmoid)."""
        x = jnp.asarray(normalize_image(image))
        _, acts = self._jit_visual(self.visual_params, x)
        logits = self._jit_decode_full(self.decoder_params, acts, cond)
        return logits[0, ..., 0]

    def reduced_activations(self, image: np.ndarray) -> List[np.ndarray]:
        """Per-image distillation targets, reference layout [N+1, 1, 64]
        (``samnerf/preprocessing/get_clipseg_embeddings.py:38-41``)."""
        x = jnp.asarray(normalize_image(image))
        _, acts = self._jit_visual(self.visual_params, x)
        reduced = self._jit_reduce(self.decoder_params, acts)
        return [np.asarray(r).transpose(1, 0, 2) for r in reduced]

    # --- rendered feature path ---------------------------------------------
    def decode_rendered(self, clipseg_grid: np.ndarray,
                        cond: jax.Array) -> jax.Array:
        """clipseg_grid [32, 32, 192] rendered by the feature field ->
        logits [512, 512] (``samnerf/sam_model.py:487-498`` semantics:
        3 x 64-d slices, CLS = token mean, trans-conv 16x upsample)."""
        g = jnp.asarray(clipseg_grid).reshape(-1, 3, 64).transpose(1, 0, 2)
        racts = []
        for i in range(3):
            a = g[i][None]  # [1, 1024, 64]
            cls = jnp.mean(a, axis=1, keepdims=True)
            racts.append(jnp.concatenate([cls, a], axis=1))  # [1, 1025, 64]
        logits = self._jit_decode_reduced(self.decoder_params, racts, cond)
        return logits[0, ..., 0]
