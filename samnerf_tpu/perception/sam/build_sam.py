"""SAM model registry + torch-checkpoint conversion.

Reference: ``samnerf/segment_anything/build_sam.py:14-107`` — ViT-H
(embed 1280 / depth 32 / heads 16 / global {7,15,23,31}), ViT-L
(1024/24/16/{5,11,17,23}), ViT-B (768/12/12/{2,5,8,11}); common:
prompt_embed_dim 256, image 1024, vit patch 16, window 14, rel-pos on.

``load_torch_weights`` converts a ``sam_vit_*.pth`` state_dict into this
package's flax param tree (NHWC conv kernels, transposed Dense kernels).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samnerf_tpu.perception.sam.image_encoder import ImageEncoderViT
from samnerf_tpu.perception.sam.mask_decoder import MaskDecoder
from samnerf_tpu.perception.sam.prompt_encoder import PromptEncoder
from samnerf_tpu.perception.sam.sam import Sam

PROMPT_EMBED_DIM = 256
IMAGE_SIZE = 1024
VIT_PATCH_SIZE = 16
EMBED_SIZE = IMAGE_SIZE // VIT_PATCH_SIZE  # 64

_VIT_SPECS = {
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
}


def build_sam(model_type: str = "vit_h", checkpoint: Optional[str] = None,
              compute_dtype: Any = jnp.float32):
    """Returns (Sam module, params-or-None)."""
    spec = _VIT_SPECS[model_type]
    sam = Sam(
        image_encoder=ImageEncoderViT(
            img_size=IMAGE_SIZE, patch_size=VIT_PATCH_SIZE,
            embed_dim=spec["embed_dim"], depth=spec["depth"],
            num_heads=spec["num_heads"], mlp_ratio=4.0,
            out_chans=PROMPT_EMBED_DIM, qkv_bias=True, use_rel_pos=True,
            window_size=14, global_attn_indexes=spec["global_attn_indexes"],
            compute_dtype=compute_dtype),
        prompt_encoder=PromptEncoder(
            embed_dim=PROMPT_EMBED_DIM,
            image_embedding_size=(EMBED_SIZE, EMBED_SIZE),
            input_image_size=(IMAGE_SIZE, IMAGE_SIZE), mask_in_chans=16,
            compute_dtype=compute_dtype),
        mask_decoder=MaskDecoder(
            transformer_dim=PROMPT_EMBED_DIM, num_multimask_outputs=3,
            iou_head_depth=3, iou_head_hidden_dim=256,
            compute_dtype=compute_dtype))
    params = None
    if checkpoint is not None:
        import torch
        state_dict = torch.load(checkpoint, map_location="cpu",
                                weights_only=True)
        params = {"params": convert_torch_state_dict(state_dict,
                                                     depth=spec["depth"])}
    return sam, params


def build_sam_vit_h(checkpoint=None, **kw):
    return build_sam("vit_h", checkpoint, **kw)


def build_sam_vit_l(checkpoint=None, **kw):
    return build_sam("vit_l", checkpoint, **kw)


def build_sam_vit_b(checkpoint=None, **kw):
    return build_sam("vit_b", checkpoint, **kw)


sam_model_registry = {
    "default": build_sam_vit_h,
    "vit_h": build_sam_vit_h,
    "vit_l": build_sam_vit_l,
    "vit_b": build_sam_vit_b,
}


# --- torch -> flax conversion -------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _ln2d(sd, prefix):
    return {"weight": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _conv_t(sd, prefix):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped: torch computes the gradient-of-conv (scatter), flax
    # ConvTranspose convolves the zero-dilated input without flipping.
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)[::-1, ::-1].copy()}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _embed(sd, prefix):
    return {"embedding": _t(sd[prefix + ".weight"])}


def _attention(sd, prefix):
    return {name: _linear(sd, f"{prefix}.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def convert_torch_state_dict(sd: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """``sam_vit_*.pth`` state_dict -> flax params['params'] tree.

    Sections (image_encoder / prompt_encoder / mask_decoder) are converted
    independently when their keys are present, so partial state dicts work.
    """
    p: Dict[str, Any] = {}
    if "image_encoder.pos_embed" in sd:
        p["image_encoder"] = _convert_image_encoder(sd, depth)
    if "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix" in sd:
        p["prompt_encoder"] = _convert_prompt_encoder(sd)
    if "mask_decoder.iou_token.weight" in sd:
        p["mask_decoder"] = _convert_mask_decoder(sd)
    return p


def _convert_image_encoder(sd, depth):
    enc: Dict[str, Any] = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": _t(sd["image_encoder.pos_embed"]),
        "neck_conv1": _conv(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln2d(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln2d(sd, "image_encoder.neck.3"),
    }
    for i in range(depth):
        b = f"image_encoder.blocks.{i}"
        attn = {
            "qkv": _linear(sd, f"{b}.attn.qkv"),
            "proj": _linear(sd, f"{b}.attn.proj"),
            "rel_pos_h": _t(sd[f"{b}.attn.rel_pos_h"]),
            "rel_pos_w": _t(sd[f"{b}.attn.rel_pos_w"]),
        }
        enc[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": attn,
            "mlp": {"lin1": _linear(sd, f"{b}.mlp.lin1"),
                    "lin2": _linear(sd, f"{b}.mlp.lin2")},
        }
    return enc


def _convert_prompt_encoder(sd):
    pe = {
        "pe_layer": {"positional_encoding_gaussian_matrix": _t(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])},
        "not_a_point_embed": _embed(sd, "prompt_encoder.not_a_point_embed"),
        "no_mask_embed": _embed(sd, "prompt_encoder.no_mask_embed"),
        "mask_downscaling_0": _conv(sd, "prompt_encoder.mask_downscaling.0"),
        "mask_downscaling_1": _ln2d(sd, "prompt_encoder.mask_downscaling.1"),
        "mask_downscaling_3": _conv(sd, "prompt_encoder.mask_downscaling.3"),
        "mask_downscaling_4": _ln2d(sd, "prompt_encoder.mask_downscaling.4"),
        "mask_downscaling_6": _conv(sd, "prompt_encoder.mask_downscaling.6"),
    }
    for i in range(4):
        pe[f"point_embeddings_{i}"] = _embed(
            sd, f"prompt_encoder.point_embeddings.{i}")
    return pe


def _convert_mask_decoder(sd):
    md: Dict[str, Any] = {
        "iou_token": _embed(sd, "mask_decoder.iou_token"),
        "mask_tokens": _embed(sd, "mask_decoder.mask_tokens"),
        "output_upscaling_0": _conv_t(sd, "mask_decoder.output_upscaling.0"),
        "output_upscaling_1": _ln2d(sd, "mask_decoder.output_upscaling.1"),
        "output_upscaling_3": _conv_t(sd, "mask_decoder.output_upscaling.3"),
    }
    for i in range(4):
        mlp = {}
        for j in range(3):
            mlp[f"layers_{j}"] = _linear(
                sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}")
        md[f"output_hypernetworks_mlps_{i}"] = mlp
    iou_head = {}
    for j in range(3):
        iou_head[f"layers_{j}"] = _linear(
            sd, f"mask_decoder.iou_prediction_head.layers.{j}")
    md["iou_prediction_head"] = iou_head

    tr: Dict[str, Any] = {"norm_final_attn": _ln(
        sd, "mask_decoder.transformer.norm_final_attn"),
        "final_attn_token_to_image": _attention(
            sd, "mask_decoder.transformer.final_attn_token_to_image")}
    for i in range(2):
        b = f"mask_decoder.transformer.layers.{i}"
        tr[f"layers_{i}"] = {
            "self_attn": _attention(sd, f"{b}.self_attn"),
            "cross_attn_token_to_image": _attention(
                sd, f"{b}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _attention(
                sd, f"{b}.cross_attn_image_to_token"),
            "mlp": {"lin1": _linear(sd, f"{b}.mlp.lin1"),
                    "lin2": _linear(sd, f"{b}.mlp.lin2")},
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"),
            "norm4": _ln(sd, f"{b}.norm4"),
        }
    md["transformer"] = tr
    return md
