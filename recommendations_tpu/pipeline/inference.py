"""Batch inference: stream data through the exported model → parquet scores.

The reference declares ``ModelInferenceConfig`` (``trainer_config.py:60-64``)
and a ``skip_inference`` gate but ships no implementation.  This runs the
wrapper's inference entry points over the val/inference stream and writes
one parquet of outputs per run:

- LTHM → per-user retrieval embeddings (the artifact a vector index ingests);
- ranker → per-impression task scores.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def run_inference(
    wrapper,
    state,
    pipeline_config,
    output_dir: str,
    kind: str = "val",
) -> Optional[str]:
    cfg = pipeline_config
    if cfg.inference is None or cfg.inference.skip_inference:
        return None
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.data.loader import get_host_dataloader
    from recommendations_tpu.data.paths import get_val_data_paths

    feats = cfg.model.features
    strategy = get_data_loader_strategy(
        cfg.data_loader, feats.get_input_columns(),
        lambda kind: feats.default_data_mapper,
    )
    paths = get_val_data_paths(cfg.dataset)
    if not paths:
        logger.info("no inference paths")
        return None
    loader = get_host_dataloader(
        kind=kind, worker_id=0, paths=paths,
        batch_size=cfg.inference.inference_batch_size,
        num_steps=cfg.inference.max_num_batches,
        data_loader_strategy=strategy, features_config=feats,
        fs_config=cfg.dataset.filesystem_config,
        drop_remainder=False,
    )

    variables = {"params": state.params}
    if state.constants:
        variables["constants"] = state.constants
    entries = wrapper.inference_models()
    jitted = {name: jax.jit(fn) for name, fn in entries.items()}

    # passthrough columns for joining results downstream
    passthrough = [
        f.name for f in feats._all_features() if f.include_in_eval_output
    ] or [
        f.name
        for f in feats._all_features()
        if f.do_not_convert_to_platform_type
    ]

    rows: List[Dict[str, Any]] = []
    for batch in loader:
        pad_mask = batch.get("_pad_mask")
        dev = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if getattr(v, "dtype", None) is not None and v.dtype.kind in "ifub"
            and k != "_pad_mask"
        }
        n = len(next(iter(batch.values())))
        keep = ~pad_mask if pad_mask is not None else np.ones(n, bool)
        record: Dict[str, np.ndarray] = {}
        for name, fn in jitted.items():
            out = fn(variables, dev)
            if isinstance(out, dict):
                for k, v in out.items():
                    arr = np.asarray(v)
                    # keep per-row scalars/vectors; skip full-sequence tensors
                    if arr.shape[:1] == (n,) and arr.ndim <= 2:
                        record[f"{name}.{k}"] = list(arr[keep])
            else:
                arr = np.asarray(out)
                if arr.shape[:1] == (n,) and arr.ndim <= 2:
                    record[name] = list(arr[keep])
        for col in passthrough:
            if col in batch:
                record[col] = list(np.asarray(batch[col])[keep])
        if record:
            rows.append(pd.DataFrame(record))

    if not rows:
        return None
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "inference_results.parquet")
    result = pd.concat(rows, axis=0).reset_index(drop=True)
    # parquet needs homogeneous column types; stringify object leftovers
    result.to_parquet(out_path)
    logger.info("wrote %d inference rows to %s", len(result), out_path)
    return out_path
