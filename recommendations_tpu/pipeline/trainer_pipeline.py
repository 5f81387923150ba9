"""Top-level pipeline: trackers → data paths → train → export → eval.

Rebuild of reference ``commons/pipeline/trainer_pipeline.py:43-224`` with the
same orchestration: log every config section as flattened params, resolve
train/val paths, run the training strategy, export the final model, run eval
(implemented here — the reference's ``eval_model`` is ``pass``), upload
artifacts.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import tempfile
from typing import Any, Dict, List, Optional

import pandas as pd

from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
from recommendations_tpu.data.data_store import DataStoreAccessor, DataStoreInterface
from recommendations_tpu.data.paths import get_train_data_paths, get_val_data_paths
from recommendations_tpu.pipeline.export import export_model_artifacts
from recommendations_tpu.pipeline.model_builder import ModelBuilder
from recommendations_tpu.pipeline.model_checkpointer import ModelCheckpointer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EvalResult:
    result_df: Optional[pd.DataFrame] = None
    score_df: Optional[pd.DataFrame] = None
    result_extra_day_df: Optional[pd.DataFrame] = None
    knn_eval_result: Optional[pd.DataFrame] = None


class TrainerPipeline:
    def __init__(
        self,
        pipeline_config: TrainerPipelineConfig,
        model_builder: ModelBuilder,
        training_strategy,
        data_loader_strategy,
    ):
        self.pipeline_config = pipeline_config
        self.model_builder = model_builder
        self.training_strategy = training_strategy
        self.data_loader_strategy = data_loader_strategy
        self.model_checkpointer = ModelCheckpointer(
            lambda state, result_df=None, result_extra_day_df=None: self.export_model(
                state=state,
                eval_result=EvalResult(result_df=result_df, result_extra_day_df=result_extra_day_df),
                training_done=False,
            )
        )
        self._trained = None  # (wrapper, state)
        self._trace_batch = None  # captured example for StableHLO tracing

    def execute(self) -> Dict[str, float]:
        cfg = self.pipeline_config
        trackers = cfg.trackers
        trackers.start_run()
        for section in ("dataset", "train", "inference", "eval", "export", "training_strategy", "data_loader"):
            obj = getattr(cfg, section, None)
            if obj is not None:
                trackers.log_params_flatten(section, obj.model_dump())
        trackers.log_params({"model_version": cfg.model_version})

        train_paths = get_train_data_paths(cfg.dataset)
        val_paths = get_val_data_paths(cfg.dataset)
        logger.info("train paths: %d, val paths: %d", len(train_paths), len(val_paths))

        if cfg.export is not None and cfg.export.trace:
            self._capture_trace_batch(train_paths)

        metrics: Dict[str, float] = {}
        if not cfg.train.skip_train:
            wrapper, state, metrics = self.training_strategy.train(
                self.model_builder,
                self.data_loader_strategy,
                train_paths,
                val_paths,
                cfg,
                self.model_checkpointer,
            )
            self._trained = (wrapper, state)
            self.export_model(state=state, eval_result=None, training_done=True)
        else:
            logger.info("skip_train: building untrained model")
            wrapper = self.model_builder.build()
            self._trained = (wrapper, None)

        if cfg.eval is not None and not cfg.eval.skip_eval:
            eval_result = self.eval_model()
            self.export_model(state=None, eval_result=eval_result, training_done=True)

        if cfg.inference is not None and not cfg.inference.skip_inference:
            self.run_inference()

        trackers.end_run()
        return metrics

    def _capture_trace_batch(self, train_paths: List[str]) -> None:
        """First mini-batch (≤32 rows) for tracing the exported inference fns
        — reference ``trainer_pipeline.py:69-90``; the loader batch size is
        ``data_loader.mini_batch_size`` (reference ``:75``)."""
        try:
            from recommendations_tpu.data.loader import get_host_dataloader

            cfg = self.pipeline_config
            loader = get_host_dataloader(
                kind="val",  # no shuffle buffer / deterministic order
                worker_id=0,
                paths=train_paths,
                batch_size=cfg.data_loader.mini_batch_size,
                num_steps=1,
                data_loader_strategy=self.data_loader_strategy,
                features_config=cfg.model.features,
                fs_config=cfg.dataset.filesystem_config,
            )
            batch = next(iter(loader), None)
            if batch is not None:
                self._trace_batch = {k: v[:32] for k, v in batch.items()}
        except Exception:
            logger.exception("trace-batch capture failed; exporting without")

    def run_inference(self) -> Optional[str]:
        """Batch inference to parquet (the reference's ModelInferenceConfig
        has no implementation behind it)."""
        if self._trained is None or self._trained[1] is None:
            return None
        import tempfile

        from recommendations_tpu.pipeline.inference import run_inference

        wrapper, state = self._trained
        cfg = self.pipeline_config
        with tempfile.TemporaryDirectory() as tmp:
            path = run_inference(wrapper, state, cfg, tmp)
            if path and cfg.export is not None:
                store = DataStoreAccessor.get_instance(cfg.export.filesystem_config)
                store.upload_dir_recursive(
                    tmp, f"{cfg.export.path_prefix}/{cfg.model_version}/inference"
                )
            return path

    # -- eval ------------------------------------------------------------------

    def eval_model(self) -> Optional[EvalResult]:
        """Offline KNN retrieval eval (the reference configures knobs for
        this — ``trainer_config.py:79-81`` — but leaves ``eval_model`` as
        ``pass``)."""
        if self._trained is None or self._trained[1] is None:
            return None
        try:
            from recommendations_tpu.pipeline.knn_eval import run_knn_eval

            wrapper, state = self._trained
            df = run_knn_eval(wrapper, state, self.pipeline_config)
            return EvalResult(knn_eval_result=df)
        except Exception:
            logger.exception("knn eval failed")
            ev = self.pipeline_config.eval
            if ev is not None and getattr(ev, "fail_on_eval_error", False):
                raise
            return None

    # -- export ----------------------------------------------------------------

    def export_model(
        self,
        state: Optional[Any],
        eval_result: Optional[EvalResult],
        training_done: bool = False,
    ) -> None:
        cfg = self.pipeline_config
        if cfg.export is None:
            return
        store = DataStoreAccessor.get_instance(cfg.export.filesystem_config)
        with tempfile.TemporaryDirectory() as tmp:
            if eval_result is not None:
                if eval_result.result_df is not None:
                    eval_result.result_df.to_csv(os.path.join(tmp, "results.csv"), index=False)
                if eval_result.result_extra_day_df is not None:
                    eval_result.result_extra_day_df.to_csv(
                        os.path.join(tmp, "results_extra_day.csv"), index=False
                    )
                if eval_result.knn_eval_result is not None:
                    eval_result.knn_eval_result.to_csv(
                        os.path.join(tmp, "knn_eval.csv"), index=False
                    )
            if state is not None and self._trained is not None:
                wrapper = self._trained[0]
                export_model_artifacts(
                    wrapper,
                    state,
                    tmp,
                    trace_batch=self._trace_batch,
                    export_config_str=cfg.export.export_config_str,
                )
            store.upload_dir_recursive(
                local_directory=tmp,
                folder=f"{cfg.export.path_prefix}/{cfg.model_version}",
            )
            cfg.trackers.log_artifacts(tmp)
