from .cache import (  # noqa: F401
    DataFrameCache,
    cache_key,
    cached_dataframe,
)
