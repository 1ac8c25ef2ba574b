"""Registry of the non-flagship model families.

Reference: ``nerfstudio/configs/method_configs.py`` registers ~14 methods
(``samnerf/samconfigs.py:32-40`` imports these models so they are part of
the config surface even though only the samnerf methods ship presets).
Each entry bundles (model constructor, loss fn, per-group optimizers) in
a trainer-agnostic shape; ``make_zoo_train_step`` below adapts any of
them to one jitted optax step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from samnerf_tpu.core.cameras import Cameras, generate_rays


@dataclasses.dataclass
class ZooMethod:
    """A registered method: zero-arg builders keep imports lazy."""
    name: str
    build: Callable[[], Any]          # () -> (flax module, config)
    loss_fn: Callable[..., Dict]      # (outputs, batch) -> losses
    loss_needs_config: bool = False
    loss_needs_params: bool = False
    use_occupancy: bool = False
    """Maintain an occupancy grid during training and pass it to the
    model (the nerfacc ``OccupancyGrid`` the reference's instant-ngp and
    nerfplayer-ngp variants train with, ``models/instant_ngp.py:117-124``,
    ``nerfplayer_ngp.py``)."""
    lr: float = 1e-2
    """Per-method Adam lr (the reference registers per-method optimizers
    in ``method_configs.py``: ~1e-2 for grid methods, 5e-4 for the pure
    MLP fields, which diverge at grid rates)."""
    dispatch_chunk: int = 16
    """Steps fused per device dispatch (lax.scan length in
    ``make_zoo_train_chunk``).  Methods with multi-second steps must use
    short chunks: a single dispatch running ~a minute on device gets the
    TPU worker killed (isolated on the nerfplayer variants — a 16-step
    scan of the same jitted step that passes alone crashes the worker,
    /tmp/np_scan.py; every fast method's 16-step chunk stays well under
    the limit)."""


def _vanilla():
    from samnerf_tpu.models import vanilla_nerf as m
    cfg = m.VanillaNerfConfig()
    return m.VanillaNerfModel(cfg), cfg


def _mipnerf():
    from samnerf_tpu.models import mipnerf as m
    cfg = m.MipNerfConfig()
    return m.MipNerfModel(cfg), cfg


def _instant_ngp():
    from samnerf_tpu.models import instant_ngp as m
    cfg = m.InstantNGPConfig()
    return m.InstantNGPModel(cfg), cfg


def _tensorf():
    from samnerf_tpu.models import tensorf as m
    cfg = m.TensoRFConfig()
    return m.TensoRFModel(cfg), cfg


def _depth_nerfacto():
    from samnerf_tpu.models import depth_nerfacto as m
    cfg = m.DepthNerfactoConfig()
    return m.DepthNerfactoModel(cfg.base), cfg


def _semantic_nerfw():
    from samnerf_tpu.models import semantic_nerfw as m
    cfg = m.SemanticNerfWConfig()
    return m.SemanticNerfWModel(cfg), cfg


def _nerfplayer():
    from samnerf_tpu.models import nerfplayer as m
    cfg = m.NerfPlayerConfig()
    return m.NerfPlayerModel(cfg), cfg


def zoo_methods() -> Dict[str, ZooMethod]:
    from samnerf_tpu.models import (depth_nerfacto, instant_ngp, mipnerf,
                                    nerfplayer, semantic_nerfw, tensorf,
                                    vanilla_nerf)
    return {
        "vanilla-nerf": ZooMethod("vanilla-nerf", _vanilla,
                                  vanilla_nerf.get_loss_dict, lr=5e-4),
        "mipnerf": ZooMethod("mipnerf", _mipnerf, mipnerf.get_loss_dict,
                             lr=5e-4),
        "instant-ngp": ZooMethod("instant-ngp", _instant_ngp,
                                 instant_ngp.get_loss_dict,
                                 use_occupancy=True),
        "tensorf": ZooMethod("tensorf", _tensorf, tensorf.get_loss_dict,
                             loss_needs_config=True, loss_needs_params=True),
        "depth-nerfacto": ZooMethod("depth-nerfacto", _depth_nerfacto,
                                    depth_nerfacto.get_loss_dict,
                                    loss_needs_config=True),
        "semantic-nerfw": ZooMethod("semantic-nerfw", _semantic_nerfw,
                                    semantic_nerfw.get_loss_dict,
                                    loss_needs_config=True),
        "nerfplayer-nerfacto": ZooMethod("nerfplayer-nerfacto", _nerfplayer,
                                         nerfplayer.get_loss_dict,
                                         dispatch_chunk=2),
        "nerfplayer-ngp": ZooMethod("nerfplayer-ngp", _nerfplayer,
                                    nerfplayer.get_loss_dict,
                                    use_occupancy=True, dispatch_chunk=2),
    }


def make_zoo_train_step(method: ZooMethod, model, config,
                        optimizer: optax.GradientTransformation):
    """One jitted optax step over (params, opt_state, cameras, batch)."""

    def step(params, opt_state, cameras: Cameras, batch, rng,
             occupancy=None):
        bundle = generate_rays(cameras, batch["indices"][:, 0],
                               batch["indices"][:, 1:].astype(jnp.float32))
        kw = {"occupancy": occupancy} if method.use_occupancy else {}

        def loss_fn(p):
            out = model.apply(p, bundle, rng=rng, train=True, **kw)
            if method.loss_needs_config and method.loss_needs_params:
                losses = method.loss_fn(config, p, out, batch)
            elif method.loss_needs_config:
                losses = method.loss_fn(config, out, batch)
            else:
                losses = method.loss_fn(out, batch)
            return sum(jax.tree.leaves(losses)), losses

        (total, losses), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {"total_loss": total, **losses}
        return new_params, new_opt, metrics

    return step


def make_zoo_train_chunk(method: ZooMethod, model, config,
                         optimizer: optax.GradientTransformation):
    """``make_zoo_train_step`` fused over a chunk of steps with
    ``lax.scan`` — one device dispatch per chunk instead of per step
    (the flagship ``engine.trainer.Trainer`` does the same; the per-step
    host/tunnel gap otherwise dominates these small models).

    Takes stacked ``batches`` (dict of [chunk, ...] arrays) and ``rngs``
    ([chunk] keys); the occupancy grid is scan-invariant (its every-16-
    step EMA update runs between chunks, matching the reference cadence,
    ``models/instant_ngp.py:186-190``).  Returns last-step metrics.
    """
    step = make_zoo_train_step(method, model, config, optimizer)

    def chunk_fn(params, opt_state, cameras: Cameras, batches, rngs,
                 occupancy=None):
        def body(carry, xs):
            p, o = carry
            batch, rng = xs
            if method.use_occupancy:
                p, o, metrics = step(p, o, cameras, batch, rng, occupancy)
            else:
                p, o, metrics = step(p, o, cameras, batch, rng)
            return (p, o), metrics

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (batches, rngs))
        return params, opt_state, jax.tree.map(lambda x: x[-1], ms)

    return chunk_fn
