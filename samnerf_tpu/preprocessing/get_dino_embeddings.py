"""DINO ViT feature extraction for distillation targets.

Reference: ``samnerf/preprocessing/get_dino_embeddings.py:17-409``
(ViTExtractor): DINO ViT with a reduced conv stride for denser patches
(:124+), interpolated position embeddings, multi-facet feature extraction
(the reference uses forward hooks; here the flax forward simply *returns*
the requested facet), and hierarchical log-binned descriptors (:237-290).

The DINO backbone is a plain pre-norm ViT (same block structure as CLIP's
visual tower minus quick-gelu); weights convert from a ``dino_vits8.pth``/
``dino_vitb8.pth`` torch checkpoint.
"""
from __future__ import annotations

import argparse
import math
from pathlib import Path
from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)

_SPECS = {
    "dino_vits8": dict(patch=8, width=384, layers=12, heads=6),
    "dino_vits16": dict(patch=16, width=384, layers=12, heads=6),
    "dino_vitb8": dict(patch=8, width=768, layers=12, heads=12),
    "dino_vitb16": dict(patch=16, width=768, layers=12, heads=12),
}


class DinoBlock(nn.Module):
    width: int
    heads: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_facets: bool = False):
        dt = self.compute_dtype
        B, N, D = x.shape
        head = D // self.heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, self.heads, head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = (qh @ kh.transpose(0, 1, 3, 2)) * (head ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=dt, name="proj")(out)
        x = x + out
        y2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y2 = nn.Dense(4 * D, dtype=dt, name="fc1")(y2)
        y2 = nn.gelu(y2, approximate=False)
        y2 = nn.Dense(D, dtype=dt, name="fc2")(y2)
        x = x + y2
        if return_facets:
            facets = {"query": split(q), "key": split(k), "value": split(v),
                      "attn": attn, "token": x}
            return x, facets
        return x


class DinoViT(nn.Module):
    """DINO ViT with adjustable effective stride (dense features)."""
    patch: int = 8
    width: int = 384
    layers: int = 12
    heads: int = 6
    stride: int = 4
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, facet_layers: Tuple[int, ...] = (11,)):
        """x: [B, H, W, 3] normalized -> dict of facets per requested layer."""
        B, H, W, _ = x.shape
        kernel = self.param("patch_kernel", nn.initializers.normal(0.02),
                            (self.patch, self.patch, 3, self.width))
        bias = self.param("patch_bias", nn.initializers.zeros, (self.width,))
        feat = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            (self.stride, self.stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        gh = 1 + (H - self.patch) // self.stride
        gw = 1 + (W - self.patch) // self.stride
        tokens = feat.reshape(B, gh * gw, self.width)

        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, (224 // self.patch) ** 2 + 1, self.width))
        # bicubic pos-emb interpolation for the strided grid
        n0 = int(math.sqrt(pos.shape[1] - 1))
        grid_pe = pos[0, 1:].reshape(n0, n0, self.width)
        grid_pe = jax.image.resize(grid_pe, (gh, gw, self.width), "bicubic")
        pe = jnp.concatenate([pos[:, :1],
                              grid_pe.reshape(1, gh * gw, self.width)], axis=1)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (B, 1, self.width)), tokens], axis=1)
        x = x + pe.astype(x.dtype)

        facets_out = {}
        for i in range(self.layers):
            blk = DinoBlock(self.width, self.heads, self.compute_dtype,
                            name=f"blocks_{i}")
            if i in facet_layers:
                x, facets = blk(x, return_facets=True)
                facets_out[i] = facets
            else:
                x = blk(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, facets_out, (gh, gw)


def log_bin(desc: np.ndarray, num_patches: Tuple[int, int],
            hierarchy: int = 2) -> np.ndarray:
    """Hierarchical log-binned descriptor (``get_dino_embeddings.py:237-290``).

    desc: [B, h, t, d] (facet per head, CLS removed) -> [B, 1, t, d*h*bins].
    """
    B, h, t, d = desc.shape
    gh, gw = num_patches
    num_bins = 1 + 8 * hierarchy
    x = desc.transpose(0, 2, 1, 3).reshape(B, t, h * d)
    x = x.transpose(0, 2, 1).reshape(B, h * d, gh, gw)
    sub = h * d

    # replicate-pad average pools of window 3^k, stride 1
    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        pad = win // 2
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
        # sliding average via cumsum
        cs = np.cumsum(np.cumsum(xp, axis=2), axis=3)
        cs = np.pad(cs, ((0, 0), (0, 0), (1, 0), (1, 0)))
        s = (cs[:, :, win:, win:] - cs[:, :, :-win, win:]
             - cs[:, :, win:, :-win] + cs[:, :, :-win, :-win])
        pools.append(s / (win * win))

    out = np.zeros((B, sub * num_bins, gh, gw), np.float32)
    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    part = 0
    for k in range(hierarchy):
        ksz = 3 ** k
        for di in (-ksz, 0, ksz):
            for dj in (-ksz, 0, ksz):
                if di == 0 and dj == 0 and k != 0:
                    continue
                ii = np.clip(ys + di, 0, gh - 1)
                jj = np.clip(xs + dj, 0, gw - 1)
                out[:, part * sub:(part + 1) * sub] = pools[k][:, :, ii, jj]
                part += 1
    return out.reshape(B, sub * num_bins, gh * gw).transpose(0, 2, 1)[:, None]


def convert_dino_state_dict(sd, layers: int) -> dict:
    """torch ``dino_vit*.pth`` -> flax params."""
    import torch

    def np_(x):
        return np.asarray(x.detach().cpu().float().numpy()
                          if isinstance(x, torch.Tensor) else x, np.float32)

    p = {
        "patch_kernel": np_(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "patch_bias": np_(sd["patch_embed.proj.bias"]),
        "cls_token": np_(sd["cls_token"]),
        "pos_embed": np_(sd["pos_embed"]),
        "norm": {"scale": np_(sd["norm.weight"]), "bias": np_(sd["norm.bias"])},
    }
    for i in range(layers):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {"scale": np_(sd[f"{b}.norm1.weight"]),
                      "bias": np_(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": np_(sd[f"{b}.norm2.weight"]),
                      "bias": np_(sd[f"{b}.norm2.bias"])},
            "qkv": {"kernel": np_(sd[f"{b}.attn.qkv.weight"]).T,
                    "bias": np_(sd[f"{b}.attn.qkv.bias"])},
            "proj": {"kernel": np_(sd[f"{b}.attn.proj.weight"]).T,
                     "bias": np_(sd[f"{b}.attn.proj.bias"])},
            "fc1": {"kernel": np_(sd[f"{b}.mlp.fc1.weight"]).T,
                    "bias": np_(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": np_(sd[f"{b}.mlp.fc2.weight"]).T,
                    "bias": np_(sd[f"{b}.mlp.fc2.bias"])},
        }
    return p


class ViTExtractor:
    """Descriptor extraction API mirroring the reference ViTExtractor."""

    def __init__(self, model_type: str = "dino_vits8", stride: int = 4,
                 checkpoint: Optional[str] = None, seed: int = 0):
        spec = _SPECS[model_type]
        self.model = DinoViT(patch=spec["patch"], width=spec["width"],
                             layers=spec["layers"], heads=spec["heads"],
                             stride=stride)
        self.layers = spec["layers"]
        self.p = spec["patch"]
        self.stride = (stride, stride)
        self.num_patches = None
        if checkpoint is not None:
            import torch
            sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
            self.params = {"params": convert_dino_state_dict(
                sd, spec["layers"])}
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 224, 224, 3)), facet_layers=(0,))
        self._apply = jax.jit(
            lambda p, x, fl: self.model.apply(p, x, facet_layers=fl),
            static_argnums=(2,))

    def preprocess(self, image: np.ndarray,
                   load_size: Optional[int] = None) -> np.ndarray:
        from PIL import Image
        if isinstance(image, (str, Path)):
            image = np.asarray(Image.open(image).convert("RGB"))
        if load_size is not None:
            h, w = image.shape[:2]
            scale = load_size / min(h, w)
            pil = Image.fromarray(image).resize(
                (int(w * scale), int(h * scale)), Image.LANCZOS)
            image = np.asarray(pil)
        x = image.astype(np.float32) / 255.0
        x = (x - np.asarray(DINO_MEAN)) / np.asarray(DINO_STD)
        return x[None]

    def extract_descriptors(self, batch: np.ndarray, layer: int = 11,
                            facet: str = "key", use_bin: bool = False,
                            include_cls: bool = False) -> np.ndarray:
        """batch [B, H, W, 3] normalized -> [B, 1, t, d'] descriptors."""
        _, facets, (gh, gw) = self._apply(self.params, jnp.asarray(batch),
                                          (layer,))
        self.num_patches = (int(gh), int(gw))
        f = np.asarray(facets[layer][facet])
        if facet == "token":
            f = f[:, None]  # [B, 1, t+1, d]
        if not include_cls:
            f = f[:, :, 1:]
        if use_bin:
            return log_bin(f, (gh, gw))
        B, h, t, d = f.shape
        return f.transpose(0, 2, 1, 3).reshape(B, t, h * d)[:, None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("image_path", type=str)
    p.add_argument("--output-path", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model-type", type=str, default="dino_vits8")
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--layer", type=int, default=11)
    p.add_argument("--facet", type=str, default="key")
    p.add_argument("--load-size", type=int, default=None)
    p.add_argument("--bin", action="store_true")
    a = p.parse_args(argv)
    import glob as globmod
    import os

    import torch
    ex = ViTExtractor(a.model_type, a.stride, checkpoint=a.checkpoint)
    paths = (sorted(globmod.glob(os.path.join(a.image_path, "*")))
             if os.path.isdir(a.image_path) else [a.image_path])
    os.makedirs(a.output_path, exist_ok=True)
    for ip in paths:
        if not ip.lower().endswith((".jpg", ".png", ".jpeg")):
            continue
        batch = ex.preprocess(ip, a.load_size)
        desc = ex.extract_descriptors(batch, a.layer, a.facet, a.bin)
        desc = desc.reshape(ex.num_patches[0], ex.num_patches[1], -1)
        out = Path(a.output_path) / (Path(ip).stem + ".pt")
        torch.save(torch.from_numpy(np.asarray(desc)), out)
        print(f"saved {out} {desc.shape}")


if __name__ == "__main__":
    main()
