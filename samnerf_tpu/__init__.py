"""samnerf_tpu: TPU-native rebuild of Segment-Anything-in-NeRF.

A JAX / XLA / Pallas framework with the capabilities of
WangFeng18/Segment-Anything-in-NeRF (reference mounted at /root/reference):
promptable SAM segmentation inside a NeRF, with optional 2D->3D feature
distillation so volumetric rendering directly emits SAM / ClipSeg embeddings.

Layout (mirrors the reference's layer map, SURVEY.md section 1, redesigned
functional/TPU-first):

- ``core``       ray/sample/camera pytrees (reference: nerfstudio/cameras/rays.py)
- ``ops``        pure compute: encodings, samplers, rendering, losses, pallas kernels
- ``fields``     hash-grid fields (nerfacto field, proposal density, SAM feature field)
- ``models``     full renderable models (nerfacto, sam model)
- ``data``       dataparser, pixel samplers, feature loaders
- ``perception`` SAM (ViT encoder / prompt encoder / mask decoder) + ClipSeg in flax
- ``engine``     train loop, optimizers, checkpointing
- ``parallel``   device mesh + sharding (replaces NCCL DDP, SURVEY.md section 2g)
- ``viewer``     viser-compatible websocket viewer server
- ``utils``      writer, profiler, colormaps
"""

__version__ = "0.1.0"
