"""Governance: lineage, catalog, and quality monitoring.

Reference surface (SURVEY.md §2.17): lineage graph over table names
(reference utils/lineage_tracker.py), data catalog with auto structure and
stats analysis (reference utils/data_catalog.py), and the quality-check
loop with thresholds and alerts (reference utils/quality_monitor.py). The
graph/metadata bookkeeping is driver-side (it is metadata, not dataflow);
every statistic inside it is computed as Spark aggregations so catalog
registration of a 100 TB table is one distributed agg pass, never a
driver-side sample.
"""

from .lineage import LineageTracker
from .catalog import DataCatalog
from .quality import QualityMonitor

__all__ = ["LineageTracker", "DataCatalog", "QualityMonitor"]
