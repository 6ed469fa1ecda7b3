"""Pipeline configuration — reference config.py re-expressed.

Same contract (env-driven, validated, immutable; config.py:15-62) but
storage-agnostic: locations are URIs instead of a hard-coded GCS
bucket + BigQuery table, so the identical pipeline runs against local
paths in tests and object-store/warehouse URIs in production.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Literal


class ConfigError(Exception):
    """Raised when configuration is invalid or missing (config.py:11)."""


@dataclass(frozen=True)
class PipelineConfig:
    input_path: str  # raw landing file/dir (reference: gs://…/raw_data/…)
    warehouse_path: str  # analytic table root (reference: BigQuery table)
    processed_dir: str  # processed CSV exports (reference: gs://…/processed/)
    backup_dir: str  # raw backups (reference: gs://…/backups/)
    write_disposition: Literal["append", "truncate"] = "append"

    def with_truncate(self) -> "PipelineConfig":
        return replace(self, write_disposition="truncate")


ENV_VARS = (
    "TRAFFIC_INPUT_PATH",
    "TRAFFIC_WAREHOUSE_PATH",
    "TRAFFIC_PROCESSED_DIR",
    "TRAFFIC_BACKUP_DIR",
)


def load_config() -> PipelineConfig:
    missing = [v for v in ENV_VARS if not os.getenv(v)]
    if missing:
        raise ConfigError(
            f"Missing required environment variables: {', '.join(missing)}"
        )
    disposition = os.getenv("TRAFFIC_WRITE_DISPOSITION", "append").lower()
    if disposition not in ("append", "truncate"):
        raise ConfigError(
            f"Invalid TRAFFIC_WRITE_DISPOSITION: {disposition}. "
            "Must be 'append' or 'truncate'."
        )
    return PipelineConfig(
        input_path=os.environ["TRAFFIC_INPUT_PATH"],
        warehouse_path=os.environ["TRAFFIC_WAREHOUSE_PATH"],
        processed_dir=os.environ["TRAFFIC_PROCESSED_DIR"],
        backup_dir=os.environ["TRAFFIC_BACKUP_DIR"],
        write_disposition=disposition,  # type: ignore[arg-type]
    )
