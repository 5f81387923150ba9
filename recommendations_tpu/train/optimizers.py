"""Optimizer assembly: model param-group hooks → optax.

Rebuild of reference ``accelerate_training_strategy.py:168-230``: the model
may claim parameter groups with its own optimizers
(``optimizers_for_param_groups``); unclaimed params fall into the default
group driven by the trainer config (optimizer_clazz reflection or Adam).
Gradient clipping and accumulation compose as optax transforms instead of
imperative loop code.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from recommendations_tpu.config.trainer_config import ModelTrainConfig
from recommendations_tpu.models.base import DEFAULT_OPTIM_GROUP, BaseModelWrapper

logger = logging.getLogger(__name__)


def _instantiate(clazz: str, **kwargs):
    """'optax.adamw' style reflection — reference ``commons/utils.py:8-11``."""
    module_name, _, attr = clazz.rpartition(".")
    import importlib

    module = importlib.import_module(module_name or "optax")
    return getattr(module, attr)(**kwargs)


def _default_tx(train_config: ModelTrainConfig) -> optax.GradientTransformation:
    if train_config.optimizer_clazz:
        kwargs = dict(train_config.optimizer_kwargs or {})
        kwargs.setdefault("learning_rate", train_config.learning_rate)
        return _instantiate(train_config.optimizer_clazz, **kwargs)
    lr: Any = train_config.learning_rate
    if train_config.lr_scheduler_clazz:
        lr = _instantiate(
            train_config.lr_scheduler_clazz, **(train_config.lr_scheduler_kwargs or {})
        )
    wd = train_config.weight_decay or 0.0
    if wd:
        return optax.adamw(learning_rate=lr, weight_decay=wd)
    return optax.adam(learning_rate=lr)


def build_optimizer(
    wrapper: BaseModelWrapper,
    train_config: ModelTrainConfig,
    params: Any,
) -> optax.GradientTransformation:
    group_txs = wrapper.optimizers_for_param_groups()
    if group_txs:
        labels = wrapper.param_labels(params)
        label_set = {l for l in jax.tree_util.tree_leaves(labels)}
        if len(group_txs) == 1 and label_set == set(group_txs):
            # single group claiming every param (e.g. LTHM's one AdamW,
            # reference wrapper.py:260-275): skip multi_transform's
            # mask/merge passes over the full param tree
            tx = next(iter(group_txs.values()))
        else:
            txs = dict(group_txs)
            txs.setdefault(DEFAULT_OPTIM_GROUP, _default_tx(train_config))
            tx = optax.multi_transform(txs, labels)
    else:
        tx = _default_tx(train_config)

    chain = []
    if train_config.gradient_clip_norm:
        chain.append(optax.clip_by_global_norm(train_config.gradient_clip_norm))
    if train_config.gradient_clip_value:
        chain.append(optax.clip(train_config.gradient_clip_value))
    chain.append(tx)
    tx = optax.chain(*chain) if len(chain) > 1 else tx

    accum = train_config.gradient_accumulation_steps
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def rowwise_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with the second moment averaged per embedding ROW.

    For an (N, d) table the optimizer state is (N, d) + (N, 1) instead of
    2x(N, d) — the standard memory trick for 100M+-row tables (the reference
    gestures at per-group optimizers via ``optim_group``/sparse flags but
    ships only dense AdamW).  For non-2D params this degrades to scalar-v
    Adam over the last axis.
    """

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros((*p.shape[:-1], 1), p.dtype), params
        )
        return {"mu": mu, "nu": nu, "count": jnp.zeros([], jnp.int32)}

    def update(grads, state, params=None):
        count = state["count"] + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.mean(
                jnp.square(g), axis=-1, keepdims=True
            ),
            state["nu"],
            grads,
        )
        c = count.astype(jnp.float32)
        mu_hat_scale = 1.0 / (1.0 - b1**c)
        nu_hat_scale = 1.0 / (1.0 - b2**c)
        updates = jax.tree_util.tree_map(
            lambda m, v: -learning_rate * (m * mu_hat_scale)
            / (jnp.sqrt(v * nu_hat_scale) + eps),
            mu,
            nu,
        )
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init, update)
