"""Ranker model wrapper: multi-task BCE/CE + AUC metrics."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from recommendations_tpu.models.base import BaseModelWrapper, Batch, Metrics
from recommendations_tpu.models.ranker.config import RankerModelConfig
from recommendations_tpu.models.ranker.metrics import binary_auc
from recommendations_tpu.models.ranker.model import FactorizedDLRM


class RankerModelWrapper(BaseModelWrapper):
    def __init__(self, model_config: RankerModelConfig, stats: Optional[Any] = None):
        self.config = model_config
        self.stats = stats
        self.module = FactorizedDLRM(model_config)

    def init_variables(self, rng, batch: Batch) -> Dict[str, Any]:
        return self.module.init(rng, batch, deterministic=True)

    def forward(self, variables, batch: Batch, rng=None, deterministic: bool = True):
        rngs = {"dropout": rng} if (rng is not None and not deterministic) else None
        return self.module.apply(variables, batch, deterministic=deterministic, rngs=rngs)

    def loss_and_metrics(
        self, params, constants, aux_state, batch: Batch, rng, training: bool
    ) -> Tuple[jnp.ndarray, Tuple[Metrics, Any]]:
        variables = {"params": params}
        if constants:
            variables["constants"] = constants
        output = self.forward(variables, batch, rng=rng, deterministic=not training)

        prefix = "train" if training else "val"
        loss = jnp.asarray(0.0, jnp.float32)
        metrics: Metrics = {}
        for task in self.config.task_list:
            logits = output[task.name].astype(jnp.float32)
            labels = batch[task.name].astype(jnp.float32)
            valid = batch.get("_pad_mask")
            w = (
                jnp.logical_not(valid).astype(jnp.float32)
                if valid is not None
                else jnp.ones((logits.shape[0],), jnp.float32)
            )
            if task.num_labels == 1:
                logit = logits.reshape(-1)
                per_ex = optax.sigmoid_binary_cross_entropy(logit, labels.reshape(-1))
                task_loss = jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)
                metrics[f"{prefix}_auc_{task.name}"] = binary_auc(
                    logit, labels.reshape(-1), valid=w > 0
                )
                metrics[f"{prefix}_pos_rate_{task.name}"] = jnp.sum(
                    labels.reshape(-1) * w
                ) / jnp.maximum(jnp.sum(w), 1.0)
            else:
                per_ex = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels.astype(jnp.int32).reshape(-1)
                )
                task_loss = jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)
                acc = (jnp.argmax(logits, -1) == labels.astype(jnp.int32).reshape(-1))
                metrics[f"{prefix}_acc_{task.name}"] = jnp.sum(
                    acc.astype(jnp.float32) * w
                ) / jnp.maximum(jnp.sum(w), 1.0)
            metrics[f"{prefix}_loss_{task.name}"] = task_loss
            loss = loss + task.weight * task_loss

        metrics[f"{prefix}_loss"] = loss
        return loss, (metrics, aux_state)

    def optimizers_for_param_groups(self) -> Optional[Dict[str, optax.GradientTransformation]]:
        return {
            "USE_OPTIM": optax.adamw(
                learning_rate=self.config.lr, weight_decay=self.config.weight_decay
            )
        }

    def param_labels(self, params):
        return jax.tree_util.tree_map(lambda _: "USE_OPTIM", params)

    def inference_models(self) -> Dict[str, Any]:
        def scorer(variables, batch):
            out = self.forward(variables, batch, deterministic=True)
            return {
                t.name: jax.nn.sigmoid(out[t.name]) if t.num_labels == 1 else jax.nn.softmax(out[t.name])
                for t in self.config.task_list
            }

        return {"ranker_scorer": scorer}
