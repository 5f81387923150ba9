"""Train-state pytree threaded through the jitted step."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    constants: Any
    opt_state: Any
    aux: Any          # model aux state (e.g. LTHM logq estimator)
    step: jnp.ndarray
    rng: jax.Array
    # lazy row-sparse embedding-table optimizer state (train/sparse_table),
    # None when the table trains through the generic optax path
    table_state: Any = None

    @classmethod
    def create(cls, params, constants, opt_state, aux, rng, table_state=None):
        return cls(
            params=params,
            constants=constants,
            opt_state=opt_state,
            aux=aux,
            step=jnp.asarray(0, jnp.int32),
            rng=rng,
            table_state=table_state,
        )
