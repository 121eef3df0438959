"""data_pipeline_framework_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference config-driven ETL framework (jacobstrickland15/data-pipeline-framework),
re-expressed Spark-first: a YAML/dict operation DSL compiles to ONE lazy
DataFrame plan that Catalyst optimizes, instead of an eager per-operator
interpreter. See SURVEY.md for the full capability map.

Public surface:
    get_spark()            — session builder tuned for analytics (AQE, Arrow, UTC)
    compile_ops(ops)       — [op dict, ...] -> (DataFrame -> DataFrame)
    Pipeline               — source -> ops -> validation -> sink orchestration
"""

from .session import get_spark
from .plans.compiler import compile_ops, apply_ops

__all__ = ["get_spark", "compile_ops", "apply_ops", "Pipeline"]
__version__ = "0.1.0"


def __getattr__(name):
    if name == "Pipeline":
        from .core.pipeline import Pipeline

        return Pipeline
    raise AttributeError(name)
