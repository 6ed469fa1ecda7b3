"""Query plans. Importing this package populates the registry."""

from . import documents, embeddings, etl, events, relational  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
