"""checkify sanitizer mode (core/debug): NaN and OOB trapped at the op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.core.debug import checked_step


def test_clean_step_passes_through():
    def step(x):
        return jnp.sum(x * 2.0)

    f = checked_step(step)
    assert float(f(jnp.ones(4))) == 8.0


def test_nan_raises_with_location():
    def step(x):
        return jnp.sum(jnp.log(x))  # log(0) -> -inf, log(-1) -> nan

    f = checked_step(step)
    with pytest.raises(Exception, match="nan|inf"):
        f(jnp.asarray([1.0, -1.0, 2.0]))


def test_oob_gather_raises():
    """index_checks are opt-in (checkify's scatter rewrite crashes on the
    mode="drop" scatters used by the bucketed embedding backward)."""
    from jax.experimental import checkify

    table = jnp.arange(8.0)

    def step(i):
        return table[i]

    f = checked_step(step, errors=checkify.float_checks | checkify.index_checks)
    assert float(f(jnp.asarray(3))) == 3.0
    with pytest.raises(Exception, match="out-of-bounds|index"):
        f(jnp.asarray(100))


def test_debug_mode_exposes_packed_metric_keys():
    """debug_numerics runs must still unpack the packed metric vector: the
    key lists have to be exposed on the strategy BEFORE the checked_step
    early return (ADVICE r3 #2 — the first metrics fetch used to raise
    AttributeError, crashing every debug run that logs metrics)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_wrapper, _tiny_batch
    from recommendations_tpu.config.training_strategy_config import (
        PjitTrainingStrategyConfig,
    )
    from recommendations_tpu.train.strategy import PjitTrainingStrategy

    strat = PjitTrainingStrategy(
        PjitTrainingStrategyConfig(mesh_data=-1, debug_numerics=True)
    )
    wrapper = _tiny_wrapper()
    batch = _tiny_batch()
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    mesh = strat._mesh()
    if hasattr(wrapper, "bind_mesh"):
        wrapper.bind_mesh(mesh)
    import optax

    _, val_step = strat._make_step_fns(wrapper, optax.sgd(1e-3), mesh)
    # attribute must exist even before any trace (this raised pre-fix)
    assert strat._train_metric_keys == []
    state = strat.init_state(
        wrapper, optax.sgd(1e-3), batch, mesh, variables=variables
    )
    # run the (cheap, forward-only) checked val step: keys fill at trace
    loss, metrics = val_step(state, batch, jax.random.PRNGKey(3))
    vals = np.asarray(jax.device_get(metrics), np.float32)
    assert len(strat._val_metric_keys) == vals.shape[0] > 0
    assert np.isfinite(dict(zip(strat._val_metric_keys, vals))["val_loss"])


def test_checks_lthm_tiny_loss():
    """The sanitizer wraps a real (tiny) LTHM loss without tripping.

    Only the forward+loss is checkified: float-checking the full
    grad+optimizer step multiplies compile time past CI budgets (checkify
    predicates every primitive).
    """
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_wrapper, _tiny_batch

    wrapper = _tiny_wrapper()
    batch = _tiny_batch()
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        loss, _ = wrapper.loss_and_metrics(
            params, variables.get("constants", {}), wrapper.init_aux_state(),
            batch, jax.random.PRNGKey(2), True,
        )
        return loss

    checked = checked_step(loss_fn)
    assert np.isfinite(float(checked(variables.get("params", {}))))
