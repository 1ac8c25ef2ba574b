"""Deployment export of the SAM decoder.

Reference: ``segment_anything/utils/onnx.py:17-144`` (SamOnnxModel) — a
decoder-only wrapper (prompt encoder + mask decoder, image embedding as
input) exported for serving without the ViT encoder.

TPU equivalent: ``jax.export`` to a portable StableHLO artifact with the
same input contract (image_embeddings, point_coords, point_labels,
mask_input, has_mask_input); ONNX itself is a CUDA-ecosystem format and
StableHLO is what XLA-based runtimes (and IREE) consume.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from samnerf_tpu.perception.sam.sam import Sam, postprocess_masks


@dataclasses.dataclass
class SamDecoderExport:
    """Serialized decoder + its calling convention."""
    artifact: bytes
    num_points: int
    multimask_output: bool


def export_decoder(sam: Sam, params, num_points: int = 5,
                   multimask_output: bool = False,
                   embed_hw: Tuple[int, int] = (64, 64)) -> SamDecoderExport:
    """Export the set_feature->decode path as StableHLO bytes.

    Inputs of the exported fn: image_embeddings [1, H, W, 256] (NHWC),
    point_coords [1, N, 2] (1024-frame), point_labels [1, N] int32
    (-1 = padding, like the ONNX wrapper's convention).
    """

    def decode(p, embeddings, coords, labels):
        low_res, iou = sam.apply(p, embeddings, (coords, labels), None,
                                 None, multimask_output,
                                 method=Sam.decode_masks)
        return low_res, iou

    f = jax.jit(lambda e, c, l: decode(params, e, c, l))
    args = (
        jax.ShapeDtypeStruct((1, *embed_hw, 256), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((1, num_points), jnp.int32),
    )
    exported = jax_export.export(f)(*args)
    return SamDecoderExport(artifact=exported.serialize(),
                            num_points=num_points,
                            multimask_output=multimask_output)


def save_decoder(path: Path, exp: SamDecoderExport) -> None:
    Path(path).write_bytes(exp.artifact)


def load_and_run(path_or_bytes, embeddings, coords, labels):
    """Round-trip helper: deserialize and call the exported decoder."""
    data = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
            else Path(path_or_bytes).read_bytes())
    exported = jax_export.deserialize(bytes(data))
    return exported.call(embeddings, coords, labels)
