"""Small fused-style MLPs and the truncated-exp density activation.

The reference runs these through tinycudann FullyFusedMLP / CutlassMLP
(``nerfstudio/fields/nerfacto_field.py:157-240``, ``samnerf/sam_field.py:51-94``);
here they are plain matmul chains that XLA fuses and tiles onto the MXU.
Params stay fp32; compute dtype is configurable (bf16 on TPU).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    """exp with clamped gradient (``nerfstudio/field_components/activations.py``):
    forward exp(x); backward grad * exp(clamp(x, -15, 15))."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class MLP(nn.Module):
    """ReLU MLP: ``num_layers`` hidden layers of ``hidden_dim``, linear out.

    Matches the tcnn convention used by the reference where
    ``n_hidden_layers = num_layers - 1`` is already resolved by the caller.
    """

    hidden_dim: int
    num_hidden_layers: int
    out_dim: int
    output_activation: Optional[Callable] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.compute_dtype)
        for _ in range(self.num_hidden_layers):
            x = nn.Dense(self.hidden_dim, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.compute_dtype)(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x.astype(jnp.float32)
