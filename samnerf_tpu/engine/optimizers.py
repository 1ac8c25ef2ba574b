"""Per-param-group optimizers + exponential-decay schedules.

Reference: ``nerfstudio/engine/optimizers.py:74-179`` (per-group Adam with
eps=1e-15) and ``nerfstudio/engine/schedulers.py:59-109``
(ExponentialDecayScheduler with optional warmup).

TPU redesign: one ``optax.multi_transform`` over the param pytree whose
top-level keys are the reference's optimizer groups
(``samnerf/sam_model.py:330-335``: fields / proposal_networks / sam_field /
conv) — no GradScaler (bf16 on TPU needs none, SURVEY.md 2f item 6).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    """One reference optimizer+scheduler pair (``samconfigs.py:90-99,144-161``)."""
    lr: float = 1e-2
    eps: float = 1e-15
    lr_final: Optional[float] = None
    max_steps: int = 10000
    warmup_steps: int = 0
    lr_pre_warmup: float = 1e-8
    ramp: str = "cosine"
    max_norm: Optional[float] = None  # optional grad clip (optimizers.py:81)


def exponential_decay_schedule(cfg: OptimizerGroupConfig) -> Callable:
    """lr(step), matching ``schedulers.py:86-109``."""
    lr_init = cfg.lr
    lr_final = cfg.lr_final if cfg.lr_final is not None else cfg.lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cfg.warmup_steps > 0:
            if cfg.ramp == "cosine":
                warm = cfg.lr_pre_warmup + (1 - cfg.lr_pre_warmup) * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / cfg.warmup_steps, 0, 1))
            else:
                warm = (cfg.lr_pre_warmup +
                        (lr_init - cfg.lr_pre_warmup) * step / cfg.warmup_steps)
        else:
            warm = lr_init
        t = jnp.clip((step - cfg.warmup_steps) /
                     max(cfg.max_steps - cfg.warmup_steps, 1), 0, 1)
        decayed = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        return jnp.where(step < cfg.warmup_steps, warm, decayed)

    return schedule


def _group_of(top_key: str) -> str:
    """Map param-tree top-level key -> optimizer group name."""
    if top_key.startswith("proposal_networks"):
        return "proposal_networks"
    return top_key


def build_optimizer(groups: Dict[str, OptimizerGroupConfig],
                    params) -> optax.GradientTransformation:
    """Per-group Adam(eps=1e-15) + exp decay over the top level of ``params``."""
    transforms = {}
    for name, cfg in groups.items():
        chain = []
        if cfg.max_norm is not None:
            chain.append(optax.clip_by_global_norm(cfg.max_norm))
        chain.append(optax.adam(learning_rate=exponential_decay_schedule(cfg),
                                eps=cfg.eps))
        transforms[name] = optax.chain(*chain)

    top = params["params"] if "params" in params else params
    labels = {k: jax.tree.map(lambda _: _group_of(k), v) for k, v in top.items()}
    if "params" in params:
        labels = {"params": labels}

    missing = {_group_of(k) for k in top} - set(groups)
    if missing:
        raise ValueError(f"no optimizer group configured for params: {missing}")
    return optax.multi_transform(transforms, labels)
