"""Parameter partitioning rules: regex over param-tree paths → PartitionSpec.

The reference has no parameter sharding (pure DDP replication).  Here the
sharding layout is declarative: an ordered rule table is matched against the
'/'-joined path of every leaf in the params pytree.  First match wins;
no match means fully replicated.

Typical LTHM rules::

    PartitionRules([
        (r".*kshift.*/table/embedding", P("model", None)),   # row-sharded
        (r".*", P()),                                         # replicate
    ])
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


class PartitionRules:
    def __init__(self, rules: Sequence[Tuple[str, PartitionSpec]]):
        self._rules = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(self, path: str) -> PartitionSpec:
        for pat, spec in self._rules:
            if pat.fullmatch(path):
                return spec
        return PartitionSpec()

    def tree_specs(self, tree):
        """A pytree of PartitionSpecs mirroring ``tree``."""

        def _path_str(path) -> str:
            parts = []
            for p in path:
                if hasattr(p, "key"):
                    parts.append(str(p.key))
                elif hasattr(p, "idx"):
                    parts.append(str(p.idx))
                else:
                    parts.append(str(p))
            return "/".join(parts)

        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: self.spec_for(_path_str(path)), tree
        )


REPLICATED = PartitionRules([(r".*", PartitionSpec())])


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_params(mesh: Mesh, params, rules: PartitionRules):
    """Device-put a params pytree according to ``rules``."""
    specs = rules.tree_specs(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, PartitionSpec("data"))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def opt_state_specs(opt_state, params, rules: PartitionRules):
    """PartitionSpecs for an optimizer-state pytree, co-sharded with params.

    Optimizer moments created by ``tree_map`` over params (Adam mu/nu,
    MultiSteps accumulators, rowwise states) carry the param's path as a
    SUFFIX of their own tree path; every such leaf inherits the matched
    param's PartitionSpec so e.g. a row-sharded embedding table's Adam
    moments live with their rows instead of being replicated (which would
    cost 2x the table bytes per device and defeat the sharding).  Leaves
    with no param suffix (step counters, schedule state) replicate.

    The spec is trimmed to the leaf's rank (a rowwise second moment (N, 1)
    still shards its rows; a scalar falls back to replicated).
    """
    param_specs = {
        _path_str(path): rules.spec_for(_path_str(path))
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    # longest param path first so nested names match their most specific rule
    ordered = sorted(param_specs.items(), key=lambda kv: -len(kv[0]))

    def spec_for_leaf(path, leaf):
        p = _path_str(path)
        for param_path, spec in ordered:
            if p == param_path or p.endswith("/" + param_path):
                ndim = getattr(leaf, "ndim", 0)
                if len(spec) > ndim:
                    spec = PartitionSpec(*tuple(spec)[:ndim])
                return spec
        return PartitionSpec()

    return jax.tree_util.tree_map_with_path(spec_for_leaf, opt_state)


def shard_opt_state(mesh: Mesh, opt_state, params, rules: PartitionRules):
    """Device-put optimizer state with each moment sharded like its param."""
    specs = opt_state_specs(opt_state, params, rules)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        opt_state,
        specs,
    )
