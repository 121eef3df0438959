"""Operator library: windows, pivots, time series, features, cleaning,
joins, layout, graph, linkage, multimodal, skew tooling."""

from .funnels import (  # noqa: F401
    cohort_retention,
    funnel_conversion,
    funnel_stages,
)
from .graph import pagerank  # noqa: F401
from .joins import asof_join, range_join  # noqa: F401
from .layout import cluster_by_zorder, quantize_uniform, zorder_key  # noqa: F401
from .linkage import fuzzy_join  # noqa: F401
from .rollup import (  # noqa: F401
    finalize_rollup, merge_rollup_state, rollup_state, update_rollup,
)
from .timeseries import holt_winters  # noqa: F401
from .skew import diagnose_skew, salted_join, two_stage_agg  # noqa: F401
from .window_ops import WINDOW_FUNCTIONS, apply_window_function  # noqa: F401

__all__ = [
    "pagerank",
    "holt_winters",
    "cohort_retention", "funnel_conversion", "funnel_stages",
    "asof_join", "range_join",
    "cluster_by_zorder", "quantize_uniform", "zorder_key",
    "fuzzy_join",
    "diagnose_skew", "salted_join", "two_stage_agg",
    "WINDOW_FUNCTIONS", "apply_window_function",
]
