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
