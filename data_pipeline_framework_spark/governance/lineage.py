"""Dataset lineage graph.

Parity with reference utils/lineage_tracker.py: nodes are dataset names,
edges are transformations with operation metadata (:17-35 dataclasses);
upstream/downstream queries (:113-185); recursive impact/provenance graph
to a depth (:187-239); text report (:241-283). The reference persists to
Postgres `metadata.data_lineage` (reference sql/init.sql:14-23); here the
graph lives in memory with `to_rows()` for persisting via any sink (JDBC,
parquet) — lineage volume is tiny, it is the data that is 100 TB, not the
graph.

The op compiler can call `track` per source->sink pair; `Pipeline.run`
wires this automatically when given a tracker.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class LineageEdge:
    source: str
    target: str
    operation: str
    metadata: dict = field(default_factory=dict)
    created_at: float = 0.0


class LineageTracker:
    def __init__(self) -> None:
        self._edges: list[LineageEdge] = []

    # -- capture ------------------------------------------------------------

    def track(
        self,
        sources: str | list[str],
        target: str,
        operation: str,
        metadata: dict | None = None,
    ) -> None:
        """Record one transformation (reference lineage_tracker.py:60-111)."""
        if isinstance(sources, str):
            sources = [sources]
        now = time.time()
        for s in sources:
            self._edges.append(
                LineageEdge(s, target, operation, dict(metadata or {}), now)
            )

    # -- queries ------------------------------------------------------------

    @property
    def nodes(self) -> set[str]:
        return {e.source for e in self._edges} | {e.target for e in self._edges}

    def upstream(self, dataset: str) -> list[str]:
        """Direct parents (reference lineage_tracker.py:113-147)."""
        return sorted({e.source for e in self._edges if e.target == dataset})

    def downstream(self, dataset: str) -> list[str]:
        """Direct children (reference lineage_tracker.py:149-185)."""
        return sorted({e.target for e in self._edges if e.source == dataset})

    def graph(self, dataset: str, depth: int = 3, direction: str = "upstream") -> dict:
        """Recursive lineage to `depth` (reference lineage_tracker.py:187-239).

        Returns {dataset, depth, parents|children: [subgraphs]}. Cycles are
        cut by tracking visited nodes along the path.
        """
        step = self.upstream if direction == "upstream" else self.downstream
        key = "parents" if direction == "upstream" else "children"

        def _walk(name: str, d: int, seen: frozenset[str]) -> dict:
            node = {"dataset": name, "depth": depth - d, key: []}
            if d <= 0:
                return node
            for nxt in step(name):
                if nxt in seen:
                    continue
                node[key].append(_walk(nxt, d - 1, seen | {nxt}))
            return node

        return _walk(dataset, depth, frozenset({dataset}))

    # -- output -------------------------------------------------------------

    def to_rows(self) -> list[dict]:
        """Edge rows for persistence (schema of metadata.data_lineage)."""
        return [
            {
                "source_table": e.source,
                "target_table": e.target,
                "transformation_type": e.operation,
                "metadata": e.metadata,
                "created_at": e.created_at,
            }
            for e in self._edges
        ]

    def report(self, dataset: str, depth: int = 3) -> str:
        """Human-readable provenance report (reference :241-283)."""
        lines = [f"Lineage report for: {dataset}", "=" * 40]

        def _fmt(node: dict, key: str, indent: int) -> None:
            lines.append("  " * indent + f"- {node['dataset']}")
            for child in node.get(key, []):
                _fmt(child, key, indent + 1)

        lines.append("Upstream (sources):")
        _fmt(self.graph(dataset, depth, "upstream"), "parents", 1)
        lines.append("Downstream (consumers):")
        _fmt(self.graph(dataset, depth, "downstream"), "children", 1)
        return "\n".join(lines)
