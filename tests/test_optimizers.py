"""Optimizer assembly: multi-group param routing + rowwise Adam."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommendations_tpu.config.trainer_config import ModelTrainConfig
from recommendations_tpu.models.base import BaseModelWrapper, DEFAULT_OPTIM_GROUP
from recommendations_tpu.train.optimizers import build_optimizer, rowwise_adam


class TwoGroupModel(BaseModelWrapper):
    """Embedding rows on rowwise-Adam, dense on AdamW (the split-optimizer
    pattern of reference base_model_wrapper.py:51-72)."""

    def init_variables(self, rng, batch):
        return {}

    def forward(self, variables, batch, rng=None, deterministic=True):
        return None

    def loss_and_metrics(self, *a, **k):
        raise NotImplementedError

    def param_labels(self, params):
        return {
            "table": "EMB",
            "dense": {"w": DEFAULT_OPTIM_GROUP, "b": DEFAULT_OPTIM_GROUP},
        }

    def optimizers_for_param_groups(self):
        return {"EMB": rowwise_adam(0.5)}


def test_multi_group_routing():
    params = {
        "table": jnp.ones((8, 4)),
        "dense": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))},
    }
    wrapper = TwoGroupModel()
    tx = build_optimizer(wrapper, ModelTrainConfig(learning_rate=0.001), params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # rowwise adam first step: -lr * sign-ish => magnitude ~0.5
    assert abs(float(updates["table"][0, 0]) + 0.5) < 1e-2
    # adam default group: magnitude ~lr
    assert abs(float(updates["dense"]["w"][0, 0]) + 0.001) < 1e-4


def test_rowwise_adam_state_shapes_and_convergence():
    table = jnp.asarray(np.random.RandomState(0).randn(16, 8), jnp.float32)
    target = jnp.zeros_like(table)
    tx = rowwise_adam(0.1)
    state = tx.init(table)
    assert state["nu"].shape == (16, 1)  # rowwise second moment

    p = table
    for _ in range(200):
        g = p - target
        u, state = tx.update(g, state, p)
        p = optax.apply_updates(p, u)
    assert float(jnp.abs(p).max()) < 0.05


def test_gradient_accumulation_wrapping():
    class Plain(TwoGroupModel):
        def optimizers_for_param_groups(self):
            return None

    params = {"w": jnp.ones((2, 2))}
    cfg = ModelTrainConfig(learning_rate=0.1, gradient_accumulation_steps=4)
    tx = build_optimizer(Plain(), cfg, params)
    state = tx.init(params)
    g = {"w": jnp.ones((2, 2))}
    for i in range(3):
        updates, state = tx.update(g, state, params)
        assert float(jnp.abs(updates["w"]).max()) == 0.0  # accumulating
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0  # 4th step applies
