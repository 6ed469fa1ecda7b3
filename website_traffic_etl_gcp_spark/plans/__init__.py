"""Query plans. Importing this package populates the registry."""

from . import (  # noqa: F401
    advanced,
    documents,
    embeddings,
    etl,
    events,
    multimodal,
    relational,
    streaming_plans,
)
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
