"""Numerics / indexing debug mode (checkify).

SURVEY.md §5 (race detection / sanitizers): the reference has no sanitizer;
its only guard is a NaN watchdog on exported weights
(``accelerate_training_strategy.py:374-398``). Here, functional purity
removes data races by construction, and this module adds the promised
debug mode: wrap any jit-able step in ``jax.experimental.checkify`` to trap
NaN/Inf produced by any primitive and out-of-bounds gathers/scatters at the
op where they happen (instead of a NaN loss many steps later).

This is a debug tool, not a production path — checkify inserts per-op
predicates, so expect a slower step. Enable via
``training_strategy.debug_numerics: true`` (config) or wrap manually:

    checked = checked_step(train_step)
    state, loss, metrics = checked(state, batch)   # raises on first bad op
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify

# float_checks: NaN/Inf from any primitive. index_checks (OOB
# gather/scatter) are available via ``errors=`` but not default: checkify's
# scatter rewrite currently crashes on mode="drop" scatters (used by the
# bucketed embedding backward) — jax-side limitation.
DEFAULT_CHECKS = checkify.float_checks


def checked_step(step_fn: Callable, errors=DEFAULT_CHECKS, jit: bool = True) -> Callable:
    """Wrap ``step_fn`` so the first NaN/Inf/OOB raises with op location.

    The wrapper is jitted (checkify functionalizes the checks, so it stays
    one compiled program); the error is fetched and thrown host-side after
    each call.
    """
    checked = checkify.checkify(step_fn, errors=errors)
    if jit:
        checked = jax.jit(checked)

    @functools.wraps(step_fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)  # host-side throw with source location
        return out

    return wrapper
