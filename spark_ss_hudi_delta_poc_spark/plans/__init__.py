from .registry import Query, all_queries  # noqa: F401
