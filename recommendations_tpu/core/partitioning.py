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
