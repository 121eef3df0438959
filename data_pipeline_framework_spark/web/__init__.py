from .app import PipelineServer  # noqa: F401
