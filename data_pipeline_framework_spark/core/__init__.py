"""Core: YAML pipeline config + the compile-and-run lifecycle.

Reference surface: ``Pipeline`` / ``PipelineFactory`` (reference
core/pipeline.py, SURVEY.md §3.1) and hierarchical YAML config with
``${ENV:default}`` substitution (reference core/config.py:123-139).
"""

from .config import load_config, substitute_env, PipelineConfig
from .pipeline import Pipeline, PipelineResult

__all__ = [
    "load_config",
    "substitute_env",
    "PipelineConfig",
    "Pipeline",
    "PipelineResult",
]
