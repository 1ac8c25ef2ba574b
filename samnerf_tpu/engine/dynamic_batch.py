"""Dynamic ray-batch sizing (instant-ngp style).

Reference: ``nerfstudio/pipelines/dynamic_batch.py`` (DynamicBatchPipeline,
:121) — scales rays/batch so rays x samples/ray stays near a target
sample budget.

TPU redesign: arbitrary batch sizes would trigger one XLA recompile per
new shape, so the controller quantizes to power-of-two buckets; a
compiled train step exists per bucket and is reused (same trick as the
viewer's resolution bucketing).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class DynamicBatchConfig:
    target_num_samples: int = 1 << 22          # dynamic_batch.py default
    max_num_rays_per_batch: int = 1 << 16
    min_num_rays_per_batch: int = 1 << 10


class DynamicBatchController:
    """Tracks measured samples/ray and emits a bucketed rays/batch."""

    def __init__(self, config: DynamicBatchConfig,
                 initial_rays_per_batch: int = 1 << 14):
        self.config = config
        self.rays_per_batch = self._bucket(initial_rays_per_batch)

    def _bucket(self, n: int) -> int:
        b = self.config.min_num_rays_per_batch
        while b * 2 <= min(n, self.config.max_num_rays_per_batch):
            b *= 2
        return b

    def update(self, measured_num_samples: float) -> int:
        """Feed the samples actually used by the last batch
        (``dynamic_batch.py:69-87``); returns the next rays/batch."""
        if measured_num_samples <= 0:
            return self.rays_per_batch
        samples_per_ray = measured_num_samples / self.rays_per_batch
        desired = int(self.config.target_num_samples / max(samples_per_ray,
                                                           1e-6))
        self.rays_per_batch = self._bucket(desired)
        return self.rays_per_batch
