"""CLI entrypoint: ``python -m website_traffic_etl_gcp_spark run``
(reference: ``python -m etl run``, __main__.py:77-94)."""

from __future__ import annotations

import argparse
import logging
import sys

from .config import ConfigError, load_config
from .pipeline import run_etl
from .session import get_spark

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s [%(levelname)s] %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger("website_traffic_etl_gcp_spark")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="website_traffic_etl_gcp_spark",
        description="Traffic data ETL: landing zone -> Spark -> warehouse",
    )
    sub = parser.add_subparsers(dest="command")
    run_p = sub.add_parser("run", help="Run the ETL pipeline")
    run_p.add_argument(
        "--truncate", action="store_true",
        help="Replace warehouse data instead of appending",
    )
    args = parser.parse_args(argv)

    if args.command != "run":
        parser.print_help()
        return 0
    try:
        config = load_config()
    except ConfigError as e:
        logger.error("Configuration error: %s", e)
        return 1
    if args.truncate:
        config = config.with_truncate()
    spark = get_spark("traffic-etl")
    counts = run_etl(spark, config)
    logger.info(
        "loaded=%d quarantined=%d", counts["loaded"], counts["quarantined"]
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
