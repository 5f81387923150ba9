"""Model contract for the trainer.

Functional rebuild of reference ``commons/base_model_wrapper.py:9-72``: where
the torch contract is a stateful ``nn.Module`` with ``train_step`` mutating
internal buffers, the JAX contract is a set of pure functions over explicit
state:

- ``variables``: flax collections — ``params`` (trainable) + ``constants``
  (frozen buffers like LSH projections).
- ``aux_state``: non-gradient train-step state (streaming logQ estimator,
  batch counter) threaded through every step.
- ``loss_and_metrics``: pure ``(params, constants, aux, batch, rng) ->
  (loss, (metrics, new_aux))`` — differentiable w.r.t. ``params`` only; the
  trainer wraps it in ``jax.value_and_grad`` inside one pjit'd step.

The parameter-grouping hooks (``param_labels`` / ``optimizers_for_param_groups``)
mirror the reference's ``optim_group`` / ``optimizers_for_param_groups``
(``base_model_wrapper.py:51-72``) but return optax transforms composed via
``optax.multi_transform``.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from recommendations_tpu.core.partitioning import PartitionRules, REPLICATED

Batch = Dict[str, jnp.ndarray]
Metrics = Dict[str, jnp.ndarray]

DEFAULT_OPTIM_GROUP = "DEFAULT_OPTIM_GROUP"


class BaseModelWrapper(abc.ABC):
    """Pure-function model interface consumed by the training strategy."""

    @abc.abstractmethod
    def init_variables(self, rng: jax.Array, batch: Batch) -> Dict[str, Any]:
        """Initialise flax variable collections from an example batch."""

    def init_aux_state(self) -> Any:
        return None

    @abc.abstractmethod
    def forward(
        self,
        variables: Dict[str, Any],
        batch: Batch,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Any:
        """Model forward (inference path)."""

    @abc.abstractmethod
    def loss_and_metrics(
        self,
        params: Any,
        constants: Any,
        aux_state: Any,
        batch: Batch,
        rng: jax.Array,
        training: bool,
    ) -> Tuple[jnp.ndarray, Tuple[Metrics, Any]]:
        """Forward + loss.  Returns (loss, (metrics, new_aux_state))."""

    # ----- optimizer hooks ---------------------------------------------------

    def param_labels(self, params: Any) -> Any:
        """Pytree of group labels mirroring ``params``.

        Default: everything in DEFAULT_OPTIM_GROUP (reference assigns
        unclaimed params to the sentinel group,
        ``accelerate_training_strategy.py:192-198``).
        """
        return jax.tree_util.tree_map(lambda _: DEFAULT_OPTIM_GROUP, params)

    def optimizers_for_param_groups(self) -> Optional[Dict[str, Any]]:
        """group label -> optax transform; None = trainer default Adam."""
        return None

    # ----- sharding hooks ----------------------------------------------------

    def partition_rules(self) -> PartitionRules:
        return REPLICATED

    # ----- export ------------------------------------------------------------

    def inference_models(self) -> Dict[str, Any]:
        """name -> (fn, example_args) jittable inference entry points for
        export (replaces TorchScript ``inference_models``,
        ``base_model_wrapper.py:29-30``)."""
        return {}
