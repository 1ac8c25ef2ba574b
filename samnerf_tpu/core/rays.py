"""Ray and sample pytrees.

TPU-native redesign of the reference ray datastructures
(``nerfstudio/cameras/rays.py:31-270``).  Differences from the reference:

- Plain ``flax.struct`` pytrees instead of torch ``TensorDataclass`` — they
  flow through ``jit`` / ``vmap`` / ``shard_map`` unchanged.
- ``RaySamples`` keeps per-ray fields un-broadcast (``origins`` stays
  ``[R, 3]``; the reference expands to ``[R, S, 3]``) — positions are
  computed on demand, which keeps HBM traffic down.
- The reference's ``spacing_to_euclidean_fn`` closure
  (``rays.py:111-112``) is replaced by storing the spacing-domain
  ``s_near`` / ``s_far`` per ray; the (static) spacing function lives in
  :mod:`samnerf_tpu.ops.samplers`.
- Everything is static-shaped; there is no packed/dynamic path (the
  reference's samnerf configs only ever use the dense path, see
  SURVEY.md section 2f item 4).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """A batch of rays. Reference: ``nerfstudio/cameras/rays.py:166-224``.

    All fields have leading shape ``[..., R]`` (usually flat ``[R]``).
    """

    origins: jax.Array  # [..., 3]
    directions: jax.Array  # [..., 3] unit vectors
    pixel_area: jax.Array  # [..., 1]
    camera_indices: Optional[jax.Array] = None  # [..., 1] int32
    nears: Optional[jax.Array] = None  # [..., 1]
    fars: Optional[jax.Array] = None  # [..., 1]
    times: Optional[jax.Array] = None  # [..., 1] in [0, 1]

    @property
    def num_rays(self) -> int:
        return self.origins.size // self.origins.shape[-1]

    def flatten(self) -> "RayBundle":
        def flat(x):
            return None if x is None else x.reshape(-1, x.shape[-1])

        return jax.tree.map(flat, self)

    def with_near_far(self, near: float, far: float) -> "RayBundle":
        """NearFarCollider (``nerfstudio/model_components/scene_colliders.py:170``)."""
        ones = jnp.ones_like(self.origins[..., :1])
        return self.replace(nears=ones * near, fars=ones * far)


@struct.dataclass
class RaySamples:
    """Samples along rays, shape ``[R, S]``.

    Reference: ``nerfstudio/cameras/rays.py:97-163`` (RaySamples + Frustums).
    ``spacing_*`` are normalized bin edges in [0, 1] before the spacing warp;
    ``s_near`` / ``s_far`` are the warped near/far used to undo the warp
    (see :func:`samnerf_tpu.ops.samplers.spacing_to_euclidean`).
    """

    origins: jax.Array  # [R, 3]
    directions: jax.Array  # [R, 3]
    starts: jax.Array  # [R, S, 1] euclidean bin starts
    ends: jax.Array  # [R, S, 1] euclidean bin ends
    spacing_starts: jax.Array  # [R, S, 1]
    spacing_ends: jax.Array  # [R, S, 1]
    s_near: jax.Array  # [R, 1]
    s_far: jax.Array  # [R, 1]
    pixel_area: Optional[jax.Array] = None  # [R, 1]
    camera_indices: Optional[jax.Array] = None  # [R, 1] int32
    times: Optional[jax.Array] = None  # [R, 1] in [0, 1]

    @property
    def deltas(self) -> jax.Array:  # [R, S, 1]
        return self.ends - self.starts

    def positions(self) -> jax.Array:
        """Frustum center positions (``rays.py:48-57``): o + d * (t0+t1)/2."""
        mids = (self.starts + self.ends) * 0.5  # [R, S, 1]
        return self.origins[..., None, :] + self.directions[..., None, :] * mids

    def get_weights(self, densities: jax.Array) -> jax.Array:
        """Alpha-compositing weights w = alpha * T (``rays.py:141-163``).

        Args:
            densities: [R, S, 1]
        Returns:
            weights [R, S, 1]
        """
        return render_weights_from_density(self.deltas, densities)

    def take_topk(self, ids: jax.Array) -> "RaySamples":
        """Gather a subset of samples per ray.

        Replaces the reference's ``_apply_fn_to_fields``/``torch.gather``
        dance (``samnerf/sam_model.py:251-255``).

        Args:
            ids: [R, K] int32 sample indices into axis -2.
        """
        from samnerf_tpu.ops.gather import take_rows

        def g(x):
            # one-hot matmul: XLA's general gather is scalar-bound on TPU
            return take_rows(x, ids)

        return self.replace(
            starts=g(self.starts),
            ends=g(self.ends),
            spacing_starts=g(self.spacing_starts),
            spacing_ends=g(self.spacing_ends),
        )


def render_weights_from_density(deltas: jax.Array, densities: jax.Array) -> jax.Array:
    """w_i = alpha_i * T_i with T_i = exp(-sum_{j<i} delta_j sigma_j).

    Reference math: ``nerfstudio/cameras/rays.py:141-163``.  Computed in
    fp32 regardless of input dtype — transmittance underflows in bf16.
    """
    delta_density = (deltas * densities).astype(jnp.float32)  # [R, S, 1]
    alphas = 1.0 - jnp.exp(-delta_density)
    csum = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1, :]), csum], axis=-2)
    transmittance = jnp.exp(-csum)
    weights = alphas * transmittance
    return jnp.nan_to_num(weights)
