"""Config loading/validation — reference config.py:34-62 contract:
env-driven construction, required-variable check, disposition
whitelist, and .env-file seeding (process env wins)."""

from __future__ import annotations

import pytest

from website_traffic_etl_gcp_spark.config import (
    ENV_VARS,
    ConfigError,
    PipelineConfig,
    load_config,
)


def _set_all(monkeypatch, tmp_path):
    values = {
        "TRAFFIC_INPUT_PATH": str(tmp_path / "raw.csv"),
        "TRAFFIC_WAREHOUSE_PATH": str(tmp_path / "wh"),
        "TRAFFIC_PROCESSED_DIR": str(tmp_path / "proc"),
        "TRAFFIC_BACKUP_DIR": str(tmp_path / "bak"),
    }
    for k, v in values.items():
        monkeypatch.setenv(k, v)
    return values


def _clear_all(monkeypatch):
    for var in ENV_VARS + ("TRAFFIC_WRITE_DISPOSITION",):
        monkeypatch.delenv(var, raising=False)


def test_load_from_env_alone(monkeypatch, tmp_path):
    _clear_all(monkeypatch)
    values = _set_all(monkeypatch, tmp_path)
    config = load_config()
    assert isinstance(config, PipelineConfig)
    assert config.input_path == values["TRAFFIC_INPUT_PATH"]
    assert config.write_disposition == "append"  # reference default


def test_missing_vars_listed_in_error(monkeypatch):
    """Reference config.py:44-48 names every missing variable."""
    _clear_all(monkeypatch)
    with pytest.raises(ConfigError) as ei:
        load_config()
    msg = str(ei.value)
    assert "Missing required environment variables" in msg
    for var in ENV_VARS:
        assert var in msg


def test_partial_missing_only_names_absent(monkeypatch, tmp_path):
    _clear_all(monkeypatch)
    _set_all(monkeypatch, tmp_path)
    monkeypatch.delenv("TRAFFIC_BACKUP_DIR")
    with pytest.raises(ConfigError, match="TRAFFIC_BACKUP_DIR"):
        load_config()
    with pytest.raises(ConfigError) as ei:
        load_config()
    assert "TRAFFIC_INPUT_PATH" not in str(ei.value)


def test_invalid_disposition_rejected(monkeypatch, tmp_path):
    """Reference config.py:50-54: whitelist is append|truncate."""
    _clear_all(monkeypatch)
    _set_all(monkeypatch, tmp_path)
    monkeypatch.setenv("TRAFFIC_WRITE_DISPOSITION", "replace")
    with pytest.raises(ConfigError, match="Invalid TRAFFIC_WRITE_DISPOSITION"):
        load_config()


def test_disposition_case_insensitive(monkeypatch, tmp_path):
    _clear_all(monkeypatch)
    _set_all(monkeypatch, tmp_path)
    monkeypatch.setenv("TRAFFIC_WRITE_DISPOSITION", "TRUNCATE")
    assert load_config().write_disposition == "truncate"


def test_dotenv_file_seeds_environment(monkeypatch, tmp_path):
    """.env parsing: comments, blanks, export prefix, quoted values."""
    _clear_all(monkeypatch)
    env_file = tmp_path / "pipeline.env"
    env_file.write_text(
        "# pipeline config\n"
        f"TRAFFIC_INPUT_PATH={tmp_path / 'raw.csv'}\n"
        f"export TRAFFIC_WAREHOUSE_PATH={tmp_path / 'wh'}\n"
        f"TRAFFIC_PROCESSED_DIR=\"{tmp_path / 'proc'}\"\n"
        f"TRAFFIC_BACKUP_DIR='{tmp_path / 'bak'}'\n"
        "\n"
        "TRAFFIC_WRITE_DISPOSITION=truncate\n"
    )
    config = load_config(env_path=str(env_file))
    assert config.input_path == str(tmp_path / "raw.csv")
    assert config.warehouse_path == str(tmp_path / "wh")
    assert config.processed_dir == str(tmp_path / "proc")
    assert config.backup_dir == str(tmp_path / "bak")
    assert config.write_disposition == "truncate"


def test_process_env_wins_over_dotenv(monkeypatch, tmp_path):
    """dotenv default semantics: existing env vars are not overridden."""
    _clear_all(monkeypatch)
    _set_all(monkeypatch, tmp_path)
    monkeypatch.setenv("TRAFFIC_INPUT_PATH", "/from/process/env.csv")
    env_file = tmp_path / "pipeline.env"
    env_file.write_text("TRAFFIC_INPUT_PATH=/from/dotenv.csv\n")
    config = load_config(env_path=str(env_file))
    assert config.input_path == "/from/process/env.csv"


def test_missing_dotenv_file_is_not_an_error(monkeypatch, tmp_path):
    """Reference behavior: load_dotenv silently no-ops when the file is
    absent; validation then reports the missing variables."""
    _clear_all(monkeypatch)
    _set_all(monkeypatch, tmp_path)
    config = load_config(env_path=str(tmp_path / "nope.env"))
    assert isinstance(config, PipelineConfig)
