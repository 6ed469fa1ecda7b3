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


def _load_dotenv(env_path: str | None) -> None:
    """Reference config.py:34-39 loads a ``.env`` file via python-dotenv
    before validating. Use the real library when present; otherwise a
    minimal parser with the same semantics that matter here:
    KEY=VALUE lines, ``#`` comments and blanks skipped, optional
    ``export `` prefix, single/double quotes stripped, and existing
    process env vars NOT overridden (dotenv's default)."""
    try:
        from dotenv import load_dotenv  # type: ignore[import-not-found]

        load_dotenv(env_path) if env_path else load_dotenv()
        return
    except ImportError:
        pass
    path = env_path or ".env"
    if not os.path.isfile(path):
        return
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
                value = value[1:-1]
            if key and key not in os.environ:
                os.environ[key] = value


def load_config(env_path: str | None = None) -> PipelineConfig:
    """Load and validate configuration from the environment, optionally
    seeding it from a ``.env`` file first (reference config.py:34-62:
    same required-variable check and disposition whitelist, with the
    reference's error messages)."""
    _load_dotenv(env_path)
    missing = [v for v in ENV_VARS if not os.getenv(v)]
    if missing:
        raise ConfigError(
            f"Missing required environment variables: {', '.join(missing)}\n"
            "Set these in your environment or .env file."
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
