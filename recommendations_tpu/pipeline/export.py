"""Model export: Orbax weights + config + StableHLO inference artifacts.

TPU-native replacement for TorchScript export (reference
``trainer_pipeline.py:169-219``): the serving artifact is
- ``params/`` — Orbax checkpoint of the inference variables,
- ``config.json`` — the full model config (``export_config_str`` intent),
- ``<name>.stablehlo`` — ``jax.export`` serialized compiled fns per
  inference model, loadable by any StableHLO runtime.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def export_model_artifacts(
    wrapper,
    state,
    directory: str,
    trace_batch: Optional[Dict[str, np.ndarray]] = None,
    export_config_str: bool = True,
) -> None:
    os.makedirs(directory, exist_ok=True)

    # 1. weights
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    variables = {"params": jax.device_get(state.params)}
    if state.constants:
        variables["constants"] = jax.device_get(state.constants)
    ckptr.save(os.path.join(os.path.abspath(directory), "params"), variables)
    ckptr.wait_until_finished()

    # 2. config
    if export_config_str:
        try:
            cfg_json = wrapper.config.model_dump_json(indent=2)
        except Exception:
            cfg_json = json.dumps(str(getattr(wrapper, "config", None)))
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(cfg_json)

    # 3. StableHLO inference programs (needs an example batch to trace)
    if trace_batch is not None:
        from jax import export as jax_export

        for name, fn in wrapper.inference_models().items():
            try:
                jit_fn = jax.jit(lambda v, b, _fn=fn: _fn(v, b))
                exported = jax_export.export(jit_fn)(variables, trace_batch)
                path = os.path.join(directory, f"{name}.stablehlo")
                with open(path, "wb") as f:
                    f.write(exported.serialize())
                logger.info("exported %s (%d bytes)", path, os.path.getsize(path))
            except Exception:
                logger.exception("StableHLO export failed for %s", name)
