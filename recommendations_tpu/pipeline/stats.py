"""Feature-statistics job: streaming quantiles over a data sample.

The reference configures this end to end (``lthm_train.yaml:57-72``: a
``stats:`` section with ``compute_stats``, ``num_bins: 400``, ``data_ratio``
and its own data-loader) but ships an empty ``commons/stats.py`` /
``stats_config.py`` (SURVEY.md §2.5#15).  The consumers exist: the
``QuantileMapper`` / ``DenseMapper`` / ``NAImputationPlusQuantileEmbedding``
layers all take precomputed quantile lists.

Implementation: a single pass over a sampled path set accumulating a
fixed-width histogram per numeric feature between running min/max from a
first calibration block, then quantiles from the histogram CDF.  Accurate to
bin resolution, bounded memory, no sort of the full stream.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import numpy as np
from pydantic import BaseModel

from recommendations_tpu.config.trainer_config import (
    DataLoaderConfig,
    FileSystemConfig,
)

logger = logging.getLogger(__name__)


class StatsConfig(BaseModel):
    """Reference ``lthm_train.yaml:57-72`` schema."""

    compute_stats: bool = False
    num_bins: int = 400
    batch_size: int = 32
    data_ratio: float = 0.1
    num_quantiles: int = 100
    data_loader: Optional[DataLoaderConfig] = None


@dataclasses.dataclass
class _Hist:
    lo: float
    hi: float
    counts: np.ndarray
    n_low: int = 0
    n_high: int = 0

    def add(self, values: np.ndarray) -> None:
        values = values[np.isfinite(values)]
        if values.size == 0:
            return
        span = max(self.hi - self.lo, 1e-12)
        idx = np.floor((values - self.lo) / span * len(self.counts)).astype(np.int64)
        self.n_low += int((idx < 0).sum())
        self.n_high += int((idx >= len(self.counts)).sum())
        idx = idx[(idx >= 0) & (idx < len(self.counts))]
        np.add.at(self.counts, idx, 1)

    def quantiles(self, qs: np.ndarray) -> np.ndarray:
        total = self.counts.sum() + self.n_low + self.n_high
        if total == 0:
            return np.zeros_like(qs)
        cdf = (self.n_low + np.cumsum(self.counts)) / total
        edges = np.linspace(self.lo, self.hi, len(self.counts) + 1)[1:]
        return np.interp(qs, cdf, edges)


class Stats:
    """Computed feature stats: name → sorted quantile list."""

    def __init__(self, quantiles: Dict[str, List[float]]):
        self.quantiles = quantiles

    def __getitem__(self, feature: str) -> List[float]:
        return self.quantiles[feature]

    def get(self, feature: str, default=None):
        return self.quantiles.get(feature, default)

    def to_dict(self) -> Dict[str, List[float]]:
        return self.quantiles


def compute_stats(
    stats_config: StatsConfig,
    feature_names: List[str],
    dataframe_iter,
) -> Stats:
    """One pass over the stream; first block calibrates [lo, hi]."""
    hists: Dict[str, _Hist] = {}
    qs = np.linspace(0.0, 1.0, stats_config.num_quantiles + 1)[1:-1]
    for df in dataframe_iter:
        for name in feature_names:
            if name not in df.columns:
                continue
            vals = np.asarray(df[name].values, dtype=np.float64)
            if name not in hists:
                finite = vals[np.isfinite(vals)]
                if finite.size == 0:
                    continue
                lo, hi = float(finite.min()), float(finite.max())
                pad = max((hi - lo) * 0.25, 1e-6)
                hists[name] = _Hist(
                    lo - pad, hi + pad, np.zeros(stats_config.num_bins, np.int64)
                )
            hists[name].add(vals)
    out = {
        name: [float(v) for v in h.quantiles(qs)] for name, h in hists.items()
    }
    logger.info("computed stats for %d features", len(out))
    return Stats(out)


def compute_stats_for_pipeline(pipeline_config, train_paths: List[str]) -> Optional[Stats]:
    """Hook used by the trainer pipeline before model build (the stats feed
    the model builder, reference ``main_training.py:30-34`` passes
    ``stats=None`` because the job never existed)."""
    stats_config = getattr(pipeline_config, "stats", None)
    if stats_config is None or not stats_config.compute_stats:
        return None
    from recommendations_tpu.data.data_store import DataStoreAccessor
    from recommendations_tpu.data.data_store import sample_paths

    feats = pipeline_config.model.features
    numeric = [f.name for f in feats.numerical_features] + [
        f.name for f in feats.lat_lng_features
    ]
    if not numeric:
        return None
    store = DataStoreAccessor.get_instance(pipeline_config.dataset.filesystem_config)
    paths = sample_paths(train_paths, stats_config.data_ratio)

    def frames():
        for p in paths:
            df = store.read_single_parquet_file(p)
            if df is not None:
                yield df

    return compute_stats(stats_config, numeric, frames())
