"""Fallback accounting for the persisted-index plans.

Six plans (knn_ivf_persisted, knn_ivfpq_persisted, knn_ivf_incremental,
the shared PQ-codebook loader, dedup_incremental_exact,
dedup_incremental_minhash) probe persisted bucketed tables and fall
back to an equivalent in-query derivation when scratch storage or the
catalog is unavailable. The fallback produces identical RESULTS, so a
correctness gate can't see which path ran — but the bench numbers are
only attributable to the index path if the index path actually
executed. Every fallback therefore records itself here:

- tests assert ``EVENTS`` stays empty when scratch is writable (a
  fallback firing in a normal environment is a bug, not a fallback);
- setting ``SPARK_GRAFT_STRICT_INDEX=1`` turns any fallback into a
  hard error, for bench runs that must measure the index path by
  construction.
"""

from __future__ import annotations

import os

__all__ = ["EVENTS", "record", "reset"]

# (plan_name, reason) tuples, in firing order, process-wide
EVENTS: list[tuple[str, str]] = []


def record(name: str, reason: str = "") -> None:
    """Log a persisted-path fallback. Raises under
    ``SPARK_GRAFT_STRICT_INDEX`` so strict runs fail loudly instead of
    silently measuring the wrong path."""
    EVENTS.append((name, reason))
    if os.environ.get("SPARK_GRAFT_STRICT_INDEX"):
        raise RuntimeError(
            f"persisted path for {name} fell back ({reason or 'see log'}) "
            "but SPARK_GRAFT_STRICT_INDEX is set"
        )


def reset() -> None:
    EVENTS.clear()
