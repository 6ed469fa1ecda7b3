"""PySpark-native analytics engine with the query surface of the
reference website-traffic ETL (JosephGillData/website_traffic-etl-gcp),
re-expressed Spark-first and extended with warehouse analytics and
LLM-training-data operators (dedup, similarity, text analysis,
multimodal plumbing).

See SURVEY.md for the coverage inventory; ``plans.registry`` is the
single source of truth for every query + its DuckDB oracle.
"""

__version__ = "0.1.0"
