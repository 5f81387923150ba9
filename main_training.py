"""Training CLI — rebuild of reference ``main_training.py:21-92``.

Usage:
    python main_training.py --config-name lthm_tiny [a.b.c=value ...]

Composes YAML from ``configs/`` (hydra-style defaults + interpolation,
without hydra — see ``recommendations_tpu/config/yaml_loader.py``), validates
into the pydantic pipeline config, and executes the trainer pipeline over the
device mesh (no Ray: one process per TPU host).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import recommendations_tpu  # noqa: F401  (enables x64)
from recommendations_tpu.config.yaml_loader import load_config, parse_cli_overrides
from recommendations_tpu.core.mesh import init_distributed
from recommendations_tpu.data.generator import get_data_loader_strategy
from recommendations_tpu.pipeline.trainer_pipeline import TrainerPipeline
from recommendations_tpu.train.strategy import get_training_strategy

# force=True: absl (pulled in by jax plugins) installs its own root handler
# at WARNING and would otherwise swallow all INFO logs
logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s %(message)s",
    force=True,
)
logger = logging.getLogger("main_training")

CONFIG_ROOT = Path(__file__).parent / "configs"


def execute_pipeline(cfg, return_pipeline: bool = False):
    from recommendations_tpu.pipeline.joint_pipeline import (
        JointPipelineConfig,
        JointTrainerPipeline,
    )

    if isinstance(cfg, JointPipelineConfig):
        # two-stage retrieval→ranking product path (BASELINE config 4)
        pipeline = JointTrainerPipeline(cfg)
        metrics = pipeline.execute()
        if return_pipeline:
            return pipeline, metrics
        return metrics

    stats = None
    if getattr(cfg, "stats", None) is not None and cfg.stats.compute_stats:
        from recommendations_tpu.data.paths import get_train_data_paths
        from recommendations_tpu.pipeline.stats import compute_stats_for_pipeline

        stats = compute_stats_for_pipeline(cfg, get_train_data_paths(cfg.dataset))
    model_builder = cfg.model.get_builder(stats=stats)
    data_loader_strategy = get_data_loader_strategy(
        cfg.data_loader,
        columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    training_strategy = get_training_strategy(cfg.training_strategy)
    pipeline = TrainerPipeline(
        pipeline_config=cfg,
        model_builder=model_builder,
        training_strategy=training_strategy,
        data_loader_strategy=data_loader_strategy,
    )
    metrics = pipeline.execute()
    if return_pipeline:
        return pipeline, metrics
    return metrics


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=str(CONFIG_ROOT))
    parser.add_argument("overrides", nargs="*", help="a.b.c=value overrides")
    args = parser.parse_args(argv)

    init_distributed()

    config_path = Path(args.config_dir) / f"{args.config_name}.yaml"
    overrides = parse_cli_overrides(args.overrides)
    cfg = load_config(config_path, overrides=overrides, search_paths=[args.config_dir])
    if hasattr(cfg, "model"):
        logger.info(
            "model=%s/%s strategy=%s", cfg.model.kind.value, cfg.model.name,
            cfg.training_strategy.name,
        )
    else:
        logger.info(
            "joint pipeline: retrieval=%s ranking=%s",
            cfg.retrieval.model.name, cfg.ranking.model.name,
        )
    metrics = execute_pipeline(cfg)
    logger.info("final metrics: %s", {k: round(v, 5) for k, v in metrics.items() if isinstance(v, float)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
